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
  grid cells (32 frames), block-diagonal-masked 17-token attention —
  the ops/pallas_lifter recipe. Differences from the lifter trunk:
  single LN before attention (no double-LN quirk), qkv/proj biases,
  8 heads of 32.
- temporal half (`temporal_block_fused`): one 243-frame sequence per
  grid cell via (1, L, 256) blocks (Mosaic pads L internally), full
  attention.

``temporal_forward_fused`` runs the whole TemporalLifter inference:
embed+PE and head in XLA on flat rows, the ten sub-blocks in these
kernels. Measured B=16 ladder (ROUND2_NOTES): XLA apply 47.9 ms ->
attention kernels 35.8 -> +fused spatial 28.4 -> +fused temporal
**23.6 ms (2.03x)**. Inference-only (serving); training keeps the flax
module. Parity test: tests/test_pallas_stblock.py.

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


def _spatial_kernel(x_ref, lna_g, lna_b, w_qkv, b_qkv, w_proj, b_proj,
                    ln2_g, ln2_b, w1, b1, w2, b2, out_ref):
    from pose3d_tpu.ops.pallas_attention import (
        block_diag_mask,
        masked_heads_attention,
    )

    x = x_ref[...]
    mask = block_diag_mask(ROWS, N_JOINTS)

    y = _ln(x, lna_g[...][0], lna_b[...][0])
    qkv = (jnp.dot(y, w_qkv[...], preferred_element_type=jnp.float32)
           + b_qkv[...][0].astype(jnp.float32)).astype(x.dtype)
    attn = masked_heads_attention(qkv, mask, HEADS, DIM_HEAD)
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


def _temporal_kernel(x_ref, lna_g, lna_b, w_qkv, b_qkv, w_proj, b_proj,
                     ln2_g, ln2_b, w1, b1, w2, b2, out_ref):
    """One (clip, joint) sequence per grid cell: the whole temporal
    sub-block (LN -> qkv -> full 243-frame attention -> proj -> residual
    -> LN -> MLP -> residual) in VMEM."""
    from pose3d_tpu.ops.pallas_attention import masked_heads_attention

    x = x_ref[0]
    y = _ln(x, lna_g[...][0], lna_b[...][0])
    qkv = (jnp.dot(y, w_qkv[...], preferred_element_type=jnp.float32)
           + b_qkv[...][0].astype(jnp.float32)).astype(x.dtype)
    attn = masked_heads_attention(qkv, None, HEADS, DIM_HEAD)
    x = x + (jnp.dot(attn, w_proj[...], preferred_element_type=jnp.float32)
             + b_proj[...][0].astype(jnp.float32)).astype(x.dtype)
    y = _ln(x, ln2_g[...][0], ln2_b[...][0])
    y = jnp.dot(y, w1[...], preferred_element_type=jnp.float32) + \
        b1[...][0].astype(jnp.float32)
    y = _gelu(y.astype(x.dtype))
    x = x + (jnp.dot(y, w2[...], preferred_element_type=jnp.float32)
             + b2[...][0].astype(jnp.float32)).astype(x.dtype)
    out_ref[0] = x


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
        # temporal sub-block: regroup rows by (clip, joint); whole
        # sub-block fused, one 243-frame sequence per grid cell
        xt = tokens.reshape(c, t, j, DIM).transpose(0, 2, 1, 3) \
            .reshape(c * j, t, DIM)
        xt = temporal_block_fused(xt, pack_temporal_weights(bp),
                                  interpret=interpret)
        tokens = xt.reshape(c, j, t, DIM).transpose(0, 2, 1, 3) \
            .reshape(c * t * j, DIM)

    g, b = _v(params["LayerNorm_0"]["scale"])[0], _v(params["LayerNorm_0"]["bias"])[0]
    y = _ln(tokens, g, b)
    y = y @ _m(params["Dense_1"]["kernel"]) + _v(params["Dense_1"]["bias"])[0]
    y = jnp.maximum(y, 0)
    y = (y @ _m(params["Dense_2"]["kernel"])
         + _v(params["Dense_2"]["bias"])[0]).astype(jnp.float32)
    return y.reshape(c, t, j, 3)

