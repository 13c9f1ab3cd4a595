"""Pallas TPU kernels: fused sub-blocks of the temporal lifter, and the
fully-fused serving forward built on them.

After the packed-attention kernels (ops/pallas_attention) took temporal
serving from 47.8 to 35.7 ms (B=16), the rest of the gap was the LN/MLP/
qkv/proj HBM round-trips around them. Each SpatioTemporalBlock HALF

    x = x + proj(attn(LN(x)))          # attention sub-block
    x = x + mlp(LN(x))                 # 4x GELU MLP

now runs as ONE kernel, entirely in VMEM, weights resident via constant
index_map:

- spatial half (`spatial_block_fused`): flat (N*17, 256) rows, 544-row
  grid cells (32 frames), exact per-frame attention computed in
  frame-aligned 136-row score chunks (ops/pallas_attention.
  frame_chunked_attention) — the ops/pallas_lifter recipe. Differences
  from the lifter trunk: single LN before attention (no double-LN
  quirk), qkv/proj biases, 8 heads of 32.
- temporal half (`temporal_slab_fused`): one clip per grid cell in the
  FRAME-MAJOR slab layout (1, T, 17*256) — joint j's sequence is a
  static 256-lane slice, and the slab is byte-identical to the spatial
  kernel's flat rows, so the inter-branch regrouping is a free reshape
  (the earlier joint-major `temporal_block_fused`, kept for
  tests/fallback, cost ten XLA transposes per forward).

``temporal_forward_fused`` runs the whole TemporalLifter inference:
embed+PE and head in XLA on flat rows, the ten sub-blocks in these
kernels. Measured B=16 ladder: XLA apply 47.9 ms -> attention kernels
35.8 -> +fused spatial 28.4 -> +fused temporal 23.6 (ROUND2_NOTES) ->
clamp-softmax 18.2 (ROUND3_NOTES; chunked scores + slab layout pending
re-measure). Inference-only (serving); training uses the fused train
kernels (ops/pallas_stblock_train). Parity: tests/test_pallas_stblock.py.

Reference provenance: the block structure is this framework's native
MotionBERT-equivalent (SURVEY.md section 5 long-context; reference
delegates to external MotionBERT, phase2_opp_mb/run.py:475-478).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose3d_tpu.ops.pallas_lifter import _gelu, _ln

N_JOINTS = 17
DIM = 256
HEADS = 8
DIM_HEAD = DIM // HEADS
MLP = 4 * DIM
ROWS = 544  # 32 frames x 17 joint tokens
ATTN_CHUNK = 136  # 8 frames per score tile (see _spatial_kernel)
# grouped-head attention: g heads' scores stacked in lanes so the score
# contractions run at K = g*DIM_HEAD (128 for g=4) instead of 8 per-head
# K=32 matmuls over lane-unaligned slices — the round-5 TRAIN-kernel win
# (pallas_stblock_train.ATTN_GROUP, TEMPORAL_TRAIN_FLOOR.md). Measured on
# chip for the SERVING forward (campaign_r5/serving_attn_group_ladder.log,
# B=16x243 whole trunk): per-head 18.40 ms/iter, g=4 18.56, g=2 19.27,
# g=8 21.27 — the win does NOT transfer (the train step's attention share
# is mostly BACKWARD; the forward's per-head chunked matmuls are already
# near their floor, and the grouped zero-FLOP expansion costs more than
# the saved issues). Default stays per-head (None); the option and its
# parity test remain for future shapes.
ATTN_GROUP = None


def _attention(qkv, seq):
    """Serving-side attention dispatch, mirroring the train kernels'
    _attention_fwd: grouped when ATTN_GROUP is set, per-head otherwise;
    frame-chunked for packed rows (seq=N_JOINTS), full for seq=None."""
    from pose3d_tpu.ops.pallas_attention import (
        frame_chunked_attention,
        grouped_chunked_attention,
        masked_heads_attention,
    )

    if ATTN_GROUP:
        return grouped_chunked_attention(qkv, seq, HEADS, DIM_HEAD,
                                         ATTN_GROUP, ATTN_CHUNK)
    if seq is None:
        return masked_heads_attention(qkv, None, HEADS, DIM_HEAD)
    return frame_chunked_attention(qkv, seq, HEADS, DIM_HEAD, ATTN_CHUNK)


def _spatial_kernel(x_ref, lna_g, lna_b, w_qkv, b_qkv, w_proj, b_proj,
                    ln2_g, ln2_b, w1, b1, w2, b2, out_ref):
    x = x_ref[...]

    y = _ln(x, lna_g[...][0], lna_b[...][0])
    qkv = (jnp.dot(y, w_qkv[...], preferred_element_type=jnp.float32)
           + b_qkv[...][0].astype(jnp.float32)).astype(x.dtype)
    # frame-aligned chunks: the dh=32-contraction score matmuls are what
    # the 32-frame packing wastes (exp measured free) — chunking cuts them
    # ROWS/ATTN_CHUNK-fold while qkv/proj/MLP keep the full-width M
    attn = _attention(qkv, N_JOINTS)
    x = x + (jnp.dot(attn, w_proj[...], preferred_element_type=jnp.float32)
             + b_proj[...][0].astype(jnp.float32)).astype(x.dtype)
    y = _ln(x, ln2_g[...][0], ln2_b[...][0])
    y = jnp.dot(y, w1[...], preferred_element_type=jnp.float32) + \
        b1[...][0].astype(jnp.float32)
    y = _gelu(y.astype(x.dtype))
    x = x + (jnp.dot(y, w2[...], preferred_element_type=jnp.float32)
             + b2[...][0].astype(jnp.float32)).astype(x.dtype)
    out_ref[...] = x


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _temporal_subblock_infer(x, lna_g, lna_b, w_qkv, b_qkv, w_proj, b_proj,
                             ln2_g, ln2_b, w1, b1, w2, b2):
    """Whole temporal sub-block (LN -> qkv -> full attention over the
    sequence -> proj -> residual -> LN -> MLP -> residual) on one (L, 256)
    sequence; operands are already-read VMEM values."""
    y = _ln(x, lna_g[0], lna_b[0])
    qkv = (jnp.dot(y, w_qkv, preferred_element_type=jnp.float32)
           + b_qkv[0].astype(jnp.float32)).astype(x.dtype)
    attn = _attention(qkv, None)
    x = x + (jnp.dot(attn, w_proj, preferred_element_type=jnp.float32)
             + b_proj[0].astype(jnp.float32)).astype(x.dtype)
    y = _ln(x, ln2_g[0], ln2_b[0])
    y = jnp.dot(y, w1, preferred_element_type=jnp.float32) + \
        b1[0].astype(jnp.float32)
    y = _gelu(y.astype(x.dtype))
    x = x + (jnp.dot(y, w2, preferred_element_type=jnp.float32)
             + b2[0].astype(jnp.float32)).astype(x.dtype)
    return x


def _temporal_kernel(x_ref, *refs):
    """One (clip, joint) sequence per grid cell."""
    out_ref = refs[-1]
    w = tuple(r[...] for r in refs[:-1])
    out_ref[0] = _temporal_subblock_infer(x_ref[0], *w)


def _temporal_slab_kernel(x_ref, *refs):
    """One clip per grid cell in FRAME-MAJOR slab layout (1, T, 17*DIM):
    joint j's 243-frame sequence lives at lanes [j*DIM, (j+1)*DIM) — a
    static 256-lane slice (free in VMEM). This kernel replaces the ten
    XLA (C,T,17,D)<->(C,17,T,D) transposes around the joint-major kernel
    with nothing: the spatial kernel's flat rows and this slab are the
    SAME bytes (reshape-only regrouping), so the whole serving trunk runs
    transpose-free (VERDICT round 2, weak item 4)."""
    out_ref = refs[-1]
    w = tuple(r[...] for r in refs[:-1])
    x = x_ref[0]
    for j in range(N_JOINTS):
        out_ref[0, :, j * DIM:(j + 1) * DIM] = _temporal_subblock_infer(
            x[:, j * DIM:(j + 1) * DIM], *w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def temporal_block_fused(x3d, weights, *, interpret=False):
    """x3d (n_seqs, L, 256) bf16 — one temporal sequence per grid cell;
    weights: the 12-tuple packed by ``pack_temporal_weights``. L need not
    be tile-aligned (Mosaic pads the block internally)."""
    n, length, _ = x3d.shape
    in_specs = [pl.BlockSpec((1, length, DIM), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [_const_spec(w.shape) for w in weights]
    return pl.pallas_call(
        _temporal_kernel,
        out_shape=jax.ShapeDtypeStruct((n, length, DIM), x3d.dtype),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, length, DIM), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x3d, *weights)


@functools.partial(jax.jit, static_argnames=("interpret",))
def temporal_slab_fused(x_slab, weights, *, interpret=False):
    """x_slab (n_clips, L, 17*256) bf16 — frame-major slab, one clip per
    grid cell; weights as in ``temporal_block_fused``. Output in the same
    layout (reshape-compatible with the spatial kernel's flat rows)."""
    n, length, width = x_slab.shape
    spec = pl.BlockSpec((1, length, width), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec] + [_const_spec(w.shape) for w in weights]
    return pl.pallas_call(
        _temporal_slab_kernel,
        out_shape=jax.ShapeDtypeStruct((n, length, width), x_slab.dtype),
        grid=(n,),
        in_specs=in_specs,
        out_specs=spec,
        # 17 unrolled per-joint sub-blocks per cell: Mosaic may keep
        # several joints' f32 intermediates live past the 16M default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_slab, *weights)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spatial_block_fused(x_flat, weights, *, interpret=False):
    """x_flat (n_frames*17, 256) bf16; weights: the 12-tuple packed by
    ``pack_spatial_weights``. Rows are zero-padded to a whole number of
    544-row cells (padded rows form isolated all-zero frames under the
    block-diagonal mask; LN of zeros is finite at eps=1e-5) and sliced
    off after."""
    n = x_flat.shape[0]
    pad = (-n) % ROWS
    if pad:
        x_flat = jnp.concatenate(
            [x_flat, jnp.zeros((pad, DIM), x_flat.dtype)], axis=0)
    in_specs = [pl.BlockSpec((ROWS, DIM), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [_const_spec(w.shape) for w in weights]
    out = pl.pallas_call(
        _spatial_kernel,
        out_shape=jax.ShapeDtypeStruct((n + pad, DIM), x_flat.dtype),
        grid=((n + pad) // ROWS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROWS, DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # the default 16M scoped-VMEM cap rejects ROWS=1088 (needs ~20M);
        # v5e has 128M physical — let the ladder actually test wide cells
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, *weights)
    return out[:n] if pad else out


def _v(g, dtype=jnp.bfloat16):
    return jnp.asarray(g, dtype).reshape(1, -1)


def _m(g, dtype=jnp.bfloat16):
    return jnp.asarray(g, dtype)


def pack_spatial_weights(block_params, dtype=jnp.bfloat16) -> tuple:
    """SpatioTemporalBlock params -> the kernel operand tuple (spatial
    half: LayerNorm_0, _MHSA_0.Dense_0/1, LayerNorm_1, _MLP_0.Dense_0/1)."""
    att = block_params["_MHSA_0"]
    mlp = block_params["_MLP_0"]
    return (
        _v(block_params["LayerNorm_0"]["scale"], dtype),
        _v(block_params["LayerNorm_0"]["bias"], dtype),
        _m(att["Dense_0"]["kernel"], dtype), _v(att["Dense_0"]["bias"], dtype),
        _m(att["Dense_1"]["kernel"], dtype), _v(att["Dense_1"]["bias"], dtype),
        _v(block_params["LayerNorm_1"]["scale"], dtype),
        _v(block_params["LayerNorm_1"]["bias"], dtype),
        _m(mlp["Dense_0"]["kernel"], dtype), _v(mlp["Dense_0"]["bias"], dtype),
        _m(mlp["Dense_1"]["kernel"], dtype), _v(mlp["Dense_1"]["bias"], dtype),
    )


def pack_temporal_weights(block_params, dtype=jnp.bfloat16) -> tuple:
    """SpatioTemporalBlock params -> the temporal-kernel operand tuple
    (LayerNorm_2, _MHSA_1.Dense_0/1, LayerNorm_3, _MLP_1.Dense_0/1)."""
    att = block_params["_MHSA_1"]
    mlp = block_params["_MLP_1"]
    return (
        _v(block_params["LayerNorm_2"]["scale"], dtype),
        _v(block_params["LayerNorm_2"]["bias"], dtype),
        _m(att["Dense_0"]["kernel"], dtype), _v(att["Dense_0"]["bias"], dtype),
        _m(att["Dense_1"]["kernel"], dtype), _v(att["Dense_1"]["bias"], dtype),
        _v(block_params["LayerNorm_3"]["scale"], dtype),
        _v(block_params["LayerNorm_3"]["bias"], dtype),
        _m(mlp["Dense_0"]["kernel"], dtype), _v(mlp["Dense_0"]["bias"], dtype),
        _m(mlp["Dense_1"]["kernel"], dtype), _v(mlp["Dense_1"]["bias"], dtype),
    )


def temporal_forward_fused(params, clips, *, n_blocks=5, clip_len=243,
                           interpret=False):
    """Fully-fused serving forward of the default TemporalLifter.

    params: flax params of ``TemporalLifter()`` (17 joints, hidden 256,
    heads 8, 5 blocks). clips: (C, T, 17, 2) f32 with T == clip_len (any
    C — the spatial kernel row-pads internally). Returns (C, T, 17, 3)
    f32 — same contract as ``model.apply(..., train=False)``.
    """
    c, t, j, _ = clips.shape
    if j != N_JOINTS or t != clip_len:
        raise ValueError(f"expected (C, {clip_len}, {N_JOINTS}, 2), got "
                         f"{clips.shape}")

    dt = jnp.bfloat16
    x = clips.reshape(c * t * j, 2).astype(dt)
    w_e = _m(params["Dense_0"]["kernel"])
    b_e = _v(params["Dense_0"]["bias"])[0]
    tokens = x @ w_e + b_e
    # PE on flat rows: (spatial + temporal) PE is a (T, 17, 256) table
    # (traced params -> no giant embedded constants), tiled per clip
    pe = (jnp.asarray(params["spatial_pe"], dt)[0, 0][None]
          + jnp.asarray(params["temporal_pe"], dt)[0, :t][:, None])
    tokens = tokens + jnp.tile(pe.reshape(t * j, DIM), (c, 1))

    for blk in range(n_blocks):
        bp = params[f"SpatioTemporalBlock_{blk}"]
        # spatial sub-block: fused kernel on flat (C*T*17, 256) rows
        tokens = spatial_block_fused(
            tokens, pack_spatial_weights(bp), interpret=interpret)
        # temporal sub-block: the slab kernel consumes the SAME frame-major
        # bytes as the flat rows (reshape only — the old joint-major
        # regrouping cost ten XLA transposes per forward)
        xt = temporal_slab_fused(
            tokens.reshape(c, t, j * DIM), pack_temporal_weights(bp),
            interpret=interpret)
        tokens = xt.reshape(c * t * j, DIM)

    g, b = _v(params["LayerNorm_0"]["scale"])[0], _v(params["LayerNorm_0"]["bias"])[0]
    y = _ln(tokens, g, b)
    y = y @ _m(params["Dense_1"]["kernel"]) + _v(params["Dense_1"]["bias"])[0]
    y = jnp.maximum(y, 0)
    y = (y @ _m(params["Dense_2"]["kernel"])
         + _v(params["Dense_2"]["bias"])[0]).astype(jnp.float32)
    return y.reshape(c, t, j, 3)

