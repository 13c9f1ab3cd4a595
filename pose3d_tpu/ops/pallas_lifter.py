"""Pallas TPU megakernel: the whole JointTransformerLifter trunk in VMEM.

Why (measured, ROUND2_NOTES): the benched lifter forward (B=8192, 17 joint
tokens, dim 256, 2 blocks — the reference MyViT architecture,
/root/reference/phase1_lifting/baselineModel.py:312-362) runs at ~18.8 ms
per iteration under plain XLA, ~13% MFU. Two structural taxes dominate:

1. **Sublane padding**: every (B, 17, 256) activation tiles the trailing
   (17, 256) as (32, 256) in bf16 — 1.9x HBM traffic on every tensor, and
   the (B, H, 17, 17) attention scores pad to (32, 128) tiles — 7.5x.
2. **Fusion breaks**: LN -> matmul -> split -> transpose -> batched tiny
   matmul -> softmax -> ... each boundary round-trips HBM.

This kernel removes both:

- Tokens are FLATTENED to rows: every tensor is 2D (B*17, features) with
  feature dims 256/768/1024 — perfectly lane-tiled, zero padding.
- Both transformer blocks run inside ONE pallas_call; activations never
  leave VMEM between the embed matmul and the output head.
- Attention is frame-chunked: the ROWS-row (64-frame) cell computes its
  per-frame scores in 8-frame (ATTN_CHUNK=136)-wide tiles; the
  block-diagonal mask (row//17 == col//17) makes each tile's row softmax
  exactly the per-frame softmax, so the packing is exact while the score
  matmuls stay (136, 136) instead of (ROWS, ROWS). No HBM scores.
- Weights enter as kernel operands with a CONSTANT index_map, so Mosaic
  fetches them once and keeps them resident across the whole grid.

Embed (+PE) and the 256->128->3 head stay in XLA on the flat (B*17, .)
layout: together they move <0.1 ms of HBM traffic and XLA fuses them fine.

Inference-only by design (the training path trains the flax module with
XLA; this kernel serves). Numerical contract: matmuls accumulate f32,
LayerNorm/softmax in f32, activations bf16 — parity with the bf16 flax
apply is ~1e-2 absolute on f32 outputs (same as any bf16 reassociation).

Used by: bench.py (headline), serving.py. Parity test:
tests/test_pallas_lifter.py (interpret mode on CPU + real kernel on TPU).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_JOINTS = 17
DIM = 256
HEADS = 4
DIM_HEAD = DIM // HEADS
MLP = 4 * DIM
# rows per grid cell: 64 frames x 17 tokens (multiple of the bf16 sublane
# tile 16). With frame-chunked attention (ATTN_CHUNK below) the score
# tile is (ROWS, ATTN_CHUNK), not (ROWS, ROWS), so VMEM no longer grows
# quadratically with ROWS and larger grid cells amortize weight reloads.
# On-chip ladder at B=8192 (campaign_r4/rows_ladder.log, v5e):
# 272 -> 6.04 ms, 544 -> 5.67, 1088 -> 5.46 (1.50M frames/s).
ROWS = 1088
# frame-aligned attention-chunk width for the packed per-frame scores
# (see ops/pallas_attention.frame_chunked_attention)
ATTN_CHUNK = 136
# grouped-head attention (g heads' scores stacked in lanes, K = g*64):
# None = per-head chunked. Measured on chip at B=8192
# (campaign_r5/serving_attn_group_ladder.log): per-head 5.469 ms/iter,
# g=2 5.592 — dh=64 already half-fills the MXU K-width and the forward's
# attention share is small, so grouping loses; per-head stays default.
ATTN_GROUP = None


@dataclass(frozen=True)
class LifterWeights:
    """Flat bf16 weight bundle for the fused trunk (per-block tuples)."""

    ln_a: tuple  # ((g, b), (g, b)) pre-attention LN (block outer LN)
    ln_b: tuple  # ((g, b), (g, b)) the reference's double LN inside attn
    w_qkv: tuple  # ((256, 768), ...)
    w_proj: tuple  # ((256, 256), ...)
    ln_2: tuple  # ((g, b), ...)
    w_1: tuple  # ((256, 1024), ...)
    b_1: tuple
    w_2: tuple  # ((1024, 256), ...)
    b_2: tuple


def _ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


# erf(x) ~= clamp(x)·P(clamp(x)^2): degree-8 Chebyshev interpolant of
# erf(x)/x in s = x^2 on [0, 9], converted to the power basis, clamped at
# |x| = 3 (erfc(3) = 2.2e-5). Max |err| vs true erf: 2.7e-5 over ALL x —
# ~150x below bf16 resolution (2^-8), so GELU built on it is bit-equivalent
# to the exact one at the kernels' bf16 activation dtype. Replaces the
# A&S 7.1.26 rational form (round 5): that one needed exp + a divide per
# element, and the on-chip ablation (campaign_r5/lift_floor_probe.log)
# measured GELU at 1.65 ms of the 5.48 ms flagship iter — 30%, all VPU
# transcendentals. Horner in s is 8 FMAs + clamp + 1 mul: pure vector ALU.
# The odd form x·P(x^2) carries the sign for free (P is even in x).
_ERF_C = (1.1283599228e+00, -3.7577772172e-01, 1.1177045202e-01,
          -2.5570011680e-02, 4.4038703607e-03, -5.4564336601e-04,
          4.5123548106e-05, -2.1986137083e-06, 4.7283642828e-08)
_ERF_CLAMP = 3.0
# P'(s) coefficients, for the polynomial gelu backward
# (ops/pallas_stblock_train._gelu_grad): d/dx [x·P(x^2)] = P(s) + 2s·P'(s)
_ERF_D = tuple(float((i + 1) * c) for i, c in enumerate(_ERF_C[1:]))


def _horner(coefs, s):
    p = jnp.full_like(s, coefs[-1])
    for c in coefs[-2::-1]:
        p = p * s + c
    return p


def _erf(x):
    xc = jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP)
    return xc * _horner(_ERF_C, xc * xc)


def _erf_grad(x):
    """d/dx of the clamped-poly erf above (0 outside the clamp, where the
    true slope is 2/sqrt(pi)·e^-9 ~ 1.4e-4 — under bf16 noise). Used by the
    train kernels' gelu backward so the gradient is the EXACT derivative
    of the forward actually computed."""
    s = jnp.square(jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP))
    inner = _horner(_ERF_C, s) + 2.0 * s * _horner(_ERF_D, s)
    return jnp.where(jnp.abs(x) < _ERF_CLAMP, inner, 0.0)


def _gelu(x):
    # exact (erf-based) gelu, matching the reference's approximate=False
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + _erf(xf / np.sqrt(2.0)))).astype(x.dtype)


def _packed_attention(qkv, mask):
    """qkv (ROWS, 768) bf16 -> attention output (ROWS, 256) bf16.

    Frame-aligned chunked per-frame attention (exact): the dh=64
    score-matmul FLOPs scale with the packed width, so the ROWS-row
    (ROWS // N_JOINTS frames) cell computes its scores in
    (ATTN_CHUNK, ATTN_CHUNK) = 8-frame tiles. The softmax math lives in
    the shared ops/pallas_attention helpers.
    """
    del mask  # the chunked helper builds its own per-chunk masks
    from pose3d_tpu.ops.pallas_attention import (
        frame_chunked_attention,
        grouped_chunked_attention,
    )

    if ATTN_GROUP:
        return grouped_chunked_attention(qkv, N_JOINTS, HEADS, DIM_HEAD,
                                         ATTN_GROUP, ATTN_CHUNK)
    return frame_chunked_attention(qkv, N_JOINTS, HEADS, DIM_HEAD,
                                   ATTN_CHUNK)


def _trunk_kernel(x_ref, pe_ref, *refs, n_blocks):
    out_ref = refs[-1]
    wrefs = refs[:-1]
    per = 9  # weight tensors per block
    # PE-add lives in the kernel: pe_ref is the (ROWS, 256) table tiled to
    # the 17-token period (ROWS % 17 == 0, so it aligns at every grid cell).
    x = x_ref[...] + pe_ref[...]
    mask = None  # _packed_attention chunks with its own per-chunk masks
    for blk in range(n_blocks):
        (lna_g, lna_b, lnb_g, lnb_b, w_qkv, w_proj, ln2_g, ln2_b, w1) = (
            wrefs[blk * per + i][...] for i in range(9))
        b1 = wrefs[n_blocks * per + blk * 3 + 0][...]
        w2 = wrefs[n_blocks * per + blk * 3 + 1][...]
        b2 = wrefs[n_blocks * per + blk * 3 + 2][...]
        y = _ln(x, lna_g[0], lna_b[0])
        y = _ln(y, lnb_g[0], lnb_b[0])  # double-LN quirk (baselineModel.py)
        qkv = jnp.dot(y, w_qkv, preferred_element_type=jnp.float32
                      ).astype(x.dtype)
        attn = _packed_attention(qkv, mask)
        x = x + jnp.dot(attn, w_proj, preferred_element_type=jnp.float32
                        ).astype(x.dtype)
        y = _ln(x, ln2_g[0], ln2_b[0])
        y = jnp.dot(y, w1, preferred_element_type=jnp.float32) + \
            b1[0].astype(jnp.float32)
        y = _gelu(y.astype(x.dtype))
        x = x + (jnp.dot(y, w2, preferred_element_type=jnp.float32)
                 + b2[0].astype(jnp.float32)).astype(x.dtype)
    out_ref[...] = x


def _const_spec(shape):
    # whole-array block, same for every grid cell -> Mosaic fetches it once
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("n_blocks", "interpret"))
def _trunk(tokens_flat, pe_rows, weights_flat, *, n_blocks, interpret):
    n = tokens_flat.shape[0]
    grid = (n // ROWS,)
    in_specs = [pl.BlockSpec((ROWS, DIM), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                _const_spec((ROWS, DIM))]
    in_specs += [_const_spec(w.shape) for w in weights_flat]
    return pl.pallas_call(
        functools.partial(_trunk_kernel, n_blocks=n_blocks),
        out_shape=jax.ShapeDtypeStruct((n, DIM), tokens_flat.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROWS, DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # frame-chunked scores no longer scale with ROWS, so larger cells
        # (better dense-matmul M, fewer weight refetches) are viable —
        # they just need more than the 16M default scoped VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tokens_flat, pe_rows, *weights_flat)


def _v(g):
    # (256,) vector params enter as (1, 256) so they tile on (sublane, lane)
    return jnp.asarray(g, jnp.bfloat16).reshape(1, -1)


def pack_weights(params) -> tuple:
    """Flatten a JointTransformerLifter flax params tree (default config)
    into the kernel operand list. Layout must match _trunk_kernel."""
    mats, vecs = [], []
    for blk in range(2):
        b = params[f"TransformerBlock_{blk}"]
        att = b["JointAttention_0"]
        mats += [
            _v(b["LayerNorm_0"]["scale"]), _v(b["LayerNorm_0"]["bias"]),
            _v(att["LayerNorm_0"]["scale"]), _v(att["LayerNorm_0"]["bias"]),
            jnp.asarray(att["Dense_0"]["kernel"], jnp.bfloat16),
            jnp.asarray(att["Dense_1"]["kernel"], jnp.bfloat16),
            _v(b["LayerNorm_1"]["scale"]), _v(b["LayerNorm_1"]["bias"]),
            jnp.asarray(b["Dense_0"]["kernel"], jnp.bfloat16),
        ]
        vecs += [
            _v(b["Dense_0"]["bias"]),
            jnp.asarray(b["Dense_1"]["kernel"], jnp.bfloat16),
            _v(b["Dense_1"]["bias"]),
        ]
    return tuple(mats + vecs)


def lifter_forward_fused(params, kp2d, *, pe, interpret=False):
    """Fused inference forward of the default JointTransformerLifter.

    params: the flax params tree of ``JointTransformerLifter()`` (17 tokens,
    dim 256, 2 blocks, no class token). kp2d: (B, 17, 2) f32, B a multiple
    of ROWS//17 frames (pad the batch host-side otherwise). pe: the (17, 256)
    positional embedding table (``sinusoidal_positional_embeddings``).
    Returns (B, 17, 3) f32 — same contract as ``model.apply(..., train=False)``.
    """
    b = kp2d.shape[0]
    if (b * N_JOINTS) % ROWS:
        raise ValueError(f"batch {b} must be a multiple of {ROWS // N_JOINTS}")
    x = kp2d.reshape(b * N_JOINTS, 2).astype(jnp.bfloat16)
    w_e = jnp.asarray(params["Dense_0"]["kernel"], jnp.bfloat16)
    b_e = jnp.asarray(params["Dense_0"]["bias"], jnp.bfloat16)
    tokens = x @ w_e + b_e
    # The PE-add happens INSIDE the kernel from a (ROWS, 256) tiled table.
    # Adding it here via broadcast over a concrete pe would constant-fold
    # into a (B*17, 256) embedded constant — 71 MB at B=8192, which the
    # remote compiler rejects (ROUND2_NOTES env gotcha) — and cost an extra
    # HBM pass besides.
    pe_rows = jnp.tile(jnp.asarray(pe, jnp.bfloat16), (ROWS // N_JOINTS, 1))
    tokens = _trunk(tokens, pe_rows, pack_weights(params), n_blocks=2,
                    interpret=interpret)

    w3 = jnp.asarray(params["Dense_1"]["kernel"], jnp.bfloat16)
    b3 = jnp.asarray(params["Dense_1"]["bias"], jnp.bfloat16)
    w4 = jnp.asarray(params["Dense_2"]["kernel"], jnp.bfloat16)
    b4 = jnp.asarray(params["Dense_2"]["bias"], jnp.bfloat16)
    y = jnp.maximum(tokens @ w3 + b3, 0)
    y = (y @ w4 + b4).astype(jnp.float32)
    return y.reshape(b, N_JOINTS, 3)
