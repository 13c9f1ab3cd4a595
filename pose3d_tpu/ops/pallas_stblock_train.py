"""Pallas TPU kernels: fused forward AND BACKWARD sub-blocks for the
temporal lifter's TRAINING step (VERDICT round 2, item 3).

Round 2 fused the serving forward (ops/pallas_stblock, 2.03x XLA) but left
training on plain XLA at 15.6% MFU: the spatial half of every block runs
LN/qkv/17-token-attention/proj/LN/MLP on (N, 17, 256) activations that XLA
pads 17 -> 32 sublanes, and the (17,17) score tiles pad to (32,128) — in
the FORWARD and the BACKWARD. A forward-only kernel cannot fix training:
the custom_vjp XLA-recompute backward re-pays the tax (measured net slower,
ROUND2_NOTES "packed-attention" section).

This module implements the missing half: a Pallas BACKWARD kernel for the
whole sub-block. Per grid cell it recomputes the forward from the saved
block INPUT (remat-in-kernel — only x is saved, no intermediate
activations round-trip HBM) and emits

- ``dx`` for the cell's rows, and
- all 12 weight/bias gradients, ACCUMULATED ACROSS GRID CELLS into
  f32 outputs with constant index maps (TPU grid cells execute
  sequentially, so init-at-cell-0 + accumulate is exact).

Two instantiations share the math:
- spatial: flat (n_frames*17, 256) rows, ``TRAIN_ROWS``-row cells, exact
  per-frame attention in frame-aligned ``ATTN_CHUNK`` score chunks;
- temporal: one clip per cell in the FRAME-MAJOR slab layout
  (1, T, 17*256) with per-joint lane slices (``temporal_slab_train``) —
  byte-identical to the spatial kernel's flat rows, so the inter-branch
  regrouping is a free reshape both forward and backward (the
  joint-major ``temporal_block_train`` is kept for tests/fallback).

``temporal_train_forward_fused`` rebuilds the differentiable TemporalLifter
forward around these custom_vjp sub-blocks (embed/PE/head and the
inter-branch regrouping stay in XLA); ``make_fused_train_apply`` adapts it
to the TrainState.apply_fn contract so the standard jitted train step and
the CLI/bench run it unchanged. Gradient parity vs the flax apply:
tests/test_pallas_stblock_train.py (interpret mode on CPU).

Numerical contract: matmul accumulation f32, LN/softmax/GELU-grad math
f32, activations and row grads in the input dtype (bf16 in production),
weight grads accumulated f32 and returned in the weights' dtype (matching
what the XLA bf16 backward produces before the f32 param cast).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose3d_tpu.ops.pallas_attention import block_diag_mask, score_exp
from pose3d_tpu.ops.pallas_lifter import _erf, _erf_grad, _gelu
from pose3d_tpu.ops.pallas_stblock import (
    DIM,
    DIM_HEAD,
    HEADS,
    MLP,
    N_JOINTS,
    pack_spatial_weights,
    pack_temporal_weights,
)

# Rows per spatial grid cell in the TRAIN kernels. The backward holds
# ~2.5x the forward's live set (score/da/ds f32 triples + dW accumulators):
# 272 rows needs 18.45M scoped VMEM — over the 16M default, so the train
# kernels raise the budget via CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
# (v5e has 128M physical VMEM; measured ladder in ROUND3_NOTES).
TRAIN_ROWS = 272
# frame-aligned attention-chunk width shared by the fused fwd/bwd spatial
# kernels: score tiles shrink (TRAIN_ROWS, TRAIN_ROWS) -> (136, 136)
ATTN_CHUNK = 136
# heads fused per attention matmul (pallas_attention.grouped_heads_*):
# 4 heads x dh=32 = K=128 full-MXU contraction instead of 8 per-head K=32
# matmuls at 25% utilization with unaligned 32-lane slices. The round-4
# ablation measured attention fwd+bwd at ~52% of the fused train step
# while being ~1% of its FLOPs; on-chip ladder (campaign_r5/
# attn_group_ladder.log, one window): spatial x5 fwd+grad 16.57 ms
# per-head -> 14.24 ms at group=4/chunk=136 (group 2/8 and chunk 272
# all worse), temporal x5 17.33 -> 15.33 ms. None = per-head
# (ablation/fallback seam); parity of both settings is pinned by
# tests/test_pallas_attention.py::TestGroupedHeadsAttention and the
# stblock-train grouped gradient parities.
ATTN_GROUP = 4
_VMEM_LIMIT = 100 * 1024 * 1024

_LN_EPS = 1e-5
_INV_SQRT2 = float(1.0 / np.sqrt(2.0))


def _gelu_grad(x):
    """d/dx of gelu(x) = 0.5·x·(1 + erf(x/sqrt2)) with erf = the clamped
    polynomial the forward uses (pallas_lifter._erf): the EXACT derivative
    of the computed forward, so fwd/bwd stay consistent and the backward
    needs no exp — the x·phi(x) term of the analytic form becomes
    0.5·x·_erf_grad(u)/sqrt2, another Horner (round 5; the old form's
    exp was part of the measured 2.6 ms no_gelu train-step delta)."""
    xf = x.astype(jnp.float32)
    u = xf * _INV_SQRT2
    return 0.5 * (1.0 + _erf(u)) + 0.5 * xf * _INV_SQRT2 * _erf_grad(u)


def _ln_fwd_stats(x):
    """f32 LayerNorm forward pieces: (xhat, r) with biased variance."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    return (xf - mu) * r, r


def _ln_bwd_input(dy_affine, xhat, r):
    """dx of LayerNorm given d(xhat*g) (already multiplied by g)."""
    m1 = jnp.mean(dy_affine, axis=-1, keepdims=True)
    m2 = jnp.mean(dy_affine * xhat, axis=-1, keepdims=True)
    return r * (dy_affine - m1 - xhat * m2)


def _dot(a, b, ta=False, tb=False):
    """f32-accumulating matmul with optional transposes (no materialized
    transpose: dot_general contracts the right axes directly)."""
    dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _chunk_spans(rows, seq, chunk):
    """Frame-aligned row spans for chunked attention; one full-width span
    when chunking would split a sequence (same predicate as
    frame_chunked_attention's fallback)."""
    if seq is None or chunk >= rows or rows % chunk or chunk % seq:
        return [(0, rows)]
    return [(c0, chunk) for c0 in range(0, rows, chunk)]


def _attention_fwd(qkv, seq):
    """seq == None -> full attention; else exact per-``seq`` attention in
    frame-aligned ``ATTN_CHUNK`` score tiles. With ``ATTN_GROUP`` set the
    per-head matmuls run head-grouped (K = ATTN_GROUP*DIM_HEAD, aligned
    slices only — see pallas_attention.grouped_heads_attention)."""
    from pose3d_tpu.ops.pallas_attention import (
        frame_chunked_attention,
        grouped_heads_attention,
        masked_heads_attention,
    )

    if ATTN_GROUP:
        spans = _chunk_spans(qkv.shape[0], seq, ATTN_CHUNK)
        outs = [
            grouped_heads_attention(qkv[c0:c0 + cl], seq, HEADS, DIM_HEAD,
                                    ATTN_GROUP)
            for c0, cl in spans
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if seq is None:
        return masked_heads_attention(qkv, None, HEADS, DIM_HEAD)
    return frame_chunked_attention(qkv, seq, HEADS, DIM_HEAD, ATTN_CHUNK)


def _subblock_fwd(x, seq, w, with_residuals=False):
    """Forward of one sub-block on (R, DIM) rows. w = 12-tuple; ``seq`` is
    the per-frame attention length (None = full attention over R).

    ``with_residuals`` additionally returns (x1, att) — the two
    activations whose in-kernel recompute dominates the backward
    (the per-head score/softmax/AV loop); saving them costs 2 (R, DIM)
    HBM round-trips vs ~half the backward's attention compute.
    """
    (g1, b1, w_qkv, b_qkv, w_p, b_p, g2, b2, w_1, b_1, w_2, b_2) = w

    dt = x.dtype
    xhat1, _ = _ln_fwd_stats(x)
    y = (xhat1 * g1.astype(jnp.float32) + b1.astype(jnp.float32)).astype(dt)
    qkv = (_dot(y, w_qkv) + b_qkv.astype(jnp.float32)).astype(dt)
    att = _attention_fwd(qkv, seq)
    x1 = x + (_dot(att, w_p) + b_p.astype(jnp.float32)).astype(dt)
    xhat2, _ = _ln_fwd_stats(x1)
    y2 = (xhat2 * g2.astype(jnp.float32) + b2.astype(jnp.float32)).astype(dt)
    h = _dot(y2, w_1) + b_1.astype(jnp.float32)
    hg = _gelu(h.astype(dt))
    out = x1 + (_dot(hg, w_2) + b_2.astype(jnp.float32)).astype(dt)
    if with_residuals:
        return out, x1, att
    return out


def _attention_bwd(qkv, datt, seq, dt):
    """dqkv (R, 3*DIM) f32 from saved qkv and the attention-output grad.

    With probs a = e*r (r the row normalizer), every use of a factors so
    the score tile only sees e:
      dv  = a^T @ do            = e^T @ (r*do)
      c   = sum(da * a, -1)     = r * sum(da * e, -1)
      ds  = a * (da - c)        = r ⊙ [e * (da - c)] =: r ⊙ ds'
      dq  = ds @ k * scale      = r * (ds' @ k) * scale
      dk  = ds^T @ q * scale    = ds'^T @ (r*q) * scale
    -> 4 elementwise passes over the score tile (exp, e*da, da-c, e*(..))
    instead of 7 with materialized probs (measured ~2x VPU cut on the
    spatial backward, ROUND3_NOTES). The spatial path (``seq`` not None)
    additionally computes the tiles in frame-aligned ``ATTN_CHUNK``
    chunks — exact, and it cuts the dh-contraction score-matmul FLOPs
    R/ATTN_CHUNK-fold (the dominant cost; exp measured free).
    """
    rows = qkv.shape[0]
    scale = DIM_HEAD ** -0.5
    if ATTN_GROUP:
        from pose3d_tpu.ops.pallas_attention import (
            grouped_attention_chunk_bwd,
        )

        parts = [
            grouped_attention_chunk_bwd(
                qkv[c0:c0 + cl], datt[c0:c0 + cl], seq, HEADS, DIM_HEAD,
                ATTN_GROUP)
            for c0, cl in _chunk_spans(rows, seq, ATTN_CHUNK)
        ]
        return (parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=0))
    if (seq is None or ATTN_CHUNK >= rows or rows % ATTN_CHUNK
            or ATTN_CHUNK % seq):
        # same predicate as frame_chunked_attention's forward fallback —
        # a chunk that is not a multiple of seq would split a sequence
        # across chunks and the per-chunk block-diagonal mask would be
        # misaligned (silently wrong gradients)
        spans = [(0, rows)]
        mask = None if seq is None else block_diag_mask(rows, seq)
    else:
        spans = [(c0, ATTN_CHUNK) for c0 in range(0, rows, ATTN_CHUNK)]
        mask = block_diag_mask(ATTN_CHUNK, seq)

    parts = []
    for c0, cl in spans:
        qkv_c = qkv[c0:c0 + cl]
        datt_c = datt[c0:c0 + cl]
        dq_heads, dk_heads, dv_heads = [], [], []
        for h in range(HEADS):
            q = qkv_c[:, h * DIM_HEAD:(h + 1) * DIM_HEAD]
            k = qkv_c[:, DIM + h * DIM_HEAD:DIM + (h + 1) * DIM_HEAD]
            v = qkv_c[:, 2 * DIM + h * DIM_HEAD:2 * DIM + (h + 1) * DIM_HEAD]
            s = _dot(q, k, tb=True) * scale
            if mask is not None:
                s = jnp.where(mask, s, -jnp.inf)
            e = score_exp(s)  # f32 (C, C)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            e_dt = e.astype(dt)
            do = datt_c[:, h * DIM_HEAD:(h + 1) * DIM_HEAD] \
                .astype(jnp.float32)
            dv_heads.append(_dot(e_dt, (r * do).astype(dt), ta=True))
            da = _dot(do.astype(dt), v, tb=True)  # f32 (C, C)
            t = da * e
            c = r * jnp.sum(t, axis=-1, keepdims=True)
            ds_dt = (t - c * e).astype(dt)  # == e*(da-c), reusing t
            dq_heads.append(_dot(ds_dt, k) * (r * scale))
            dk_heads.append(_dot(ds_dt, (r.astype(dt) * q).astype(dt),
                                 ta=True) * scale)
        parts.append(jnp.concatenate(
            [jnp.concatenate(dq_heads, axis=-1),
             jnp.concatenate(dk_heads, axis=-1),
             jnp.concatenate(dv_heads, axis=-1)], axis=-1))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _subblock_bwd(x, dout, seq, w, x1=None, att=None):
    """Recompute-forward backward of one sub-block; ``seq`` as in
    ``_subblock_fwd``.

    ``x1``/``att`` are the residuals saved by the forward kernel; when
    None (not saved) they are recomputed here, costing an extra per-head
    score/softmax/AV pass. Returns (dx, (dg1, db1, dwqkv, dbqkv, dwp,
    dbp, dg2, db2, dw1, db1f, dw2, db2f)) — row grads in x.dtype, weight
    grads f32.
    """
    (g1, b1, w_qkv, b_qkv, w_p, b_p, g2, b2, w_1, b_1, w_2, b_2) = w
    dt = x.dtype

    # ---- recompute forward (keeping what the backward needs)
    xhat1, r1 = _ln_fwd_stats(x)
    g1f, g2f = g1.astype(jnp.float32), g2.astype(jnp.float32)
    y = (xhat1 * g1f + b1.astype(jnp.float32)).astype(dt)
    qkv = (_dot(y, w_qkv) + b_qkv.astype(jnp.float32)).astype(dt)

    if att is None:
        att = _attention_fwd(qkv, seq)
    if x1 is None:
        x1 = x + (_dot(att, w_p) + b_p.astype(jnp.float32)).astype(dt)
    xhat2, r2 = _ln_fwd_stats(x1)
    y2 = (xhat2 * g2f + b2.astype(jnp.float32)).astype(dt)
    h_pre = _dot(y2, w_1) + b_1.astype(jnp.float32)  # f32 (R, MLP)
    hg = _gelu(h_pre.astype(dt))  # dt (R, MLP)

    # ---- backward
    doutf = dout.astype(jnp.float32)
    # MLP half: out = x1 + hg @ w2 + b2
    dw2 = _dot(hg, dout, ta=True)
    db2f = jnp.sum(doutf, axis=0, keepdims=True)
    dhg = _dot(dout, w_2, tb=True)  # f32 (R, MLP)
    dh = (dhg * _gelu_grad(h_pre)).astype(dt)
    dw1 = _dot(y2, dh, ta=True)
    db1f = jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dy2 = _dot(dh, w_1, tb=True)  # f32 (R, DIM)
    dg2 = jnp.sum(dy2 * xhat2, axis=0, keepdims=True)
    db2 = jnp.sum(dy2, axis=0, keepdims=True)
    dx1 = doutf + _ln_bwd_input(dy2 * g2f, xhat2, r2)  # f32 (R, DIM)

    # proj half: x1 = x + att @ wp + bp
    dx1_dt = dx1.astype(dt)
    dwp = _dot(att, dx1_dt, ta=True)
    dbp = jnp.sum(dx1, axis=0, keepdims=True)
    datt = _dot(dx1_dt, w_p, tb=True)  # f32 (R, DIM)

    dqkv = _attention_bwd(qkv, datt, seq, dt)  # f32 (R, 3*DIM)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dqkv_dt = dqkv.astype(dt)
    dwqkv = _dot(y, dqkv_dt, ta=True)
    dy = _dot(dqkv_dt, w_qkv, tb=True)  # f32 (R, DIM)
    dg1 = jnp.sum(dy * xhat1, axis=0, keepdims=True)
    db1 = jnp.sum(dy, axis=0, keepdims=True)
    dx = dx1 + _ln_bwd_input(dy * g1f, xhat1, r1)

    return dx.astype(dt), (dg1, db1, dwqkv, dbqkv, dwp, dbp, dg2, db2,
                           dw1, db1f, dw2, db2f)


# weight-grad output shapes (f32), in pack order
_DW_SHAPES = (
    (1, DIM), (1, DIM),            # ln1 g/b
    (DIM, 3 * DIM), (1, 3 * DIM),  # qkv
    (DIM, DIM), (1, DIM),          # proj
    (1, DIM), (1, DIM),            # ln2 g/b
    (DIM, MLP), (1, MLP),          # fc1
    (MLP, DIM), (1, DIM),          # fc2
)


def _norm_weight_values(refs):
    """Read 12 weight refs: (1, n) rows -> (n,) vectors, matrices as-is."""
    vals = []
    for r in refs:
        v = r[...]
        if v.ndim == 2 and v.shape[0] == 1:
            v = v[0]
        vals.append(v)
    return tuple(vals)


def _spatial_fwd_kernel(x_ref, *refs, rows):
    w = _norm_weight_values(refs[:-3])
    out_ref, x1_ref, att_ref = refs[-3:]
    del rows  # block shape already pins it
    out, x1, att = _subblock_fwd(
        x_ref[...], N_JOINTS, w, with_residuals=True)
    out_ref[...] = out
    x1_ref[...] = x1
    att_ref[...] = att


def _spatial_bwd_kernel(x_ref, x1_ref, att_ref, dout_ref, *refs, rows):
    w_refs, out_refs = refs[:12], refs[12:]
    dx_ref, dw_refs = out_refs[0], out_refs[1:]
    w = _norm_weight_values(w_refs)
    del rows  # block shape already pins it
    dx, dws = _subblock_bwd(x_ref[...], dout_ref[...], N_JOINTS, w,
                            x1=x1_ref[...], att=att_ref[...])
    dx_ref[...] = dx

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref, dw in zip(dw_refs, dws):
            ref[...] = dw.reshape(ref.shape)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        for ref, dw in zip(dw_refs, dws):
            ref[...] += dw.reshape(ref.shape)


def _temporal_fwd_kernel(x_ref, *refs):
    w = _norm_weight_values(refs[:-3])
    out_ref, x1_ref, att_ref = refs[-3:]
    out, x1, att = _subblock_fwd(x_ref[0], None, w, with_residuals=True)
    out_ref[0] = out
    x1_ref[0] = x1
    att_ref[0] = att


def _temporal_bwd_kernel(x_ref, x1_ref, att_ref, dout_ref, *refs):
    w_refs, out_refs = refs[:12], refs[12:]
    dx_ref, dw_refs = out_refs[0], out_refs[1:]
    w = _norm_weight_values(w_refs)
    dx, dws = _subblock_bwd(x_ref[0], dout_ref[0], None, w,
                            x1=x1_ref[0], att=att_ref[0])
    dx_ref[0] = dx

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref, dw in zip(dw_refs, dws):
            ref[...] = dw.reshape(ref.shape)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        for ref, dw in zip(dw_refs, dws):
            ref[...] += dw.reshape(ref.shape)


def _temporal_slab_fwd_kernel(x_ref, *refs):
    """One clip per grid cell in FRAME-MAJOR slab layout (1, T, 17*DIM):
    joint j's sequence is the static 256-lane slice [j*DIM, (j+1)*DIM) —
    free in VMEM. Replaces the joint-major kernel plus the ten XLA
    transposes per forward (and their ten autodiff twins per backward):
    the spatial kernel's flat rows and this slab are the same bytes."""
    w = _norm_weight_values(refs[:-3])
    out_ref, x1_ref, att_ref = refs[-3:]
    x = x_ref[0]
    for j in range(N_JOINTS):
        sl = slice(j * DIM, (j + 1) * DIM)
        out, x1, att = _subblock_fwd(x[:, sl], None, w, with_residuals=True)
        out_ref[0, :, sl] = out
        x1_ref[0, :, sl] = x1
        att_ref[0, :, sl] = att


def _temporal_slab_bwd_kernel(x_ref, x1_ref, att_ref, dout_ref, *refs):
    w_refs, out_refs = refs[:12], refs[12:]
    dx_ref, dw_refs = out_refs[0], out_refs[1:]
    w = _norm_weight_values(w_refs)
    x, x1, att, dout = x_ref[0], x1_ref[0], att_ref[0], dout_ref[0]
    acc = None
    for j in range(N_JOINTS):
        sl = slice(j * DIM, (j + 1) * DIM)
        dx, dws = _subblock_bwd(x[:, sl], dout[:, sl], None, w,
                                x1=x1[:, sl], att=att[:, sl])
        dx_ref[0, :, sl] = dx
        acc = dws if acc is None else tuple(
            a + d for a, d in zip(acc, dws))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref, dw in zip(dw_refs, acc):
            ref[...] = dw.reshape(ref.shape)

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        for ref, dw in zip(dw_refs, acc):
            ref[...] += dw.reshape(ref.shape)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pad_rows(x, rows):
    n = x.shape[0]
    pad = (-n) % rows
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, pad


def _spatial_fwd_impl(x_flat, weights, interpret):
    """Forward + residuals; returns (out (n, DIM), residuals) where the
    residuals (xp, x1p, attp) stay ROW-PADDED so the backward reuses them
    without re-padding."""
    n = x_flat.shape[0]
    xp, pad = _pad_rows(x_flat, TRAIN_ROWS)
    row_spec = pl.BlockSpec((TRAIN_ROWS, DIM), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [row_spec] + [_const_spec(w.shape) for w in weights]
    shape = jax.ShapeDtypeStruct((n + pad, DIM), x_flat.dtype)
    out, x1p, attp = pl.pallas_call(
        functools.partial(_spatial_fwd_kernel, rows=TRAIN_ROWS),
        out_shape=[shape, shape, shape],
        grid=((n + pad) // TRAIN_ROWS,),
        in_specs=in_specs,
        out_specs=[row_spec, row_spec, row_spec],
        interpret=interpret,
    )(xp, *weights)
    return (out[:n] if pad else out), (xp, x1p, attp)


def _spatial_bwd_impl(res, dout, weights, interpret):
    xp, x1p, attp = res
    n = dout.shape[0]
    pad = xp.shape[0] - n
    dp, _ = _pad_rows(dout, TRAIN_ROWS)
    row_spec = pl.BlockSpec((TRAIN_ROWS, DIM), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [row_spec] * 4 + [_const_spec(w.shape) for w in weights]
    out_shapes = [jax.ShapeDtypeStruct((n + pad, DIM), dout.dtype)]
    out_specs = [row_spec]
    for shape in _DW_SHAPES:
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
        out_specs.append(_const_spec(shape))
    outs = pl.pallas_call(
        functools.partial(_spatial_bwd_kernel, rows=TRAIN_ROWS),
        out_shape=out_shapes,
        grid=((n + pad) // TRAIN_ROWS,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, x1p, attp, dp, *weights)
    dx = outs[0][:n] if pad else outs[0]
    return dx, outs[1:]


def _temporal_fwd_impl(x3d, weights, interpret):
    n, length, _ = x3d.shape
    seq_spec = pl.BlockSpec((1, length, DIM), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [seq_spec] + [_const_spec(w.shape) for w in weights]
    shape = jax.ShapeDtypeStruct((n, length, DIM), x3d.dtype)
    out, x1p, attp = pl.pallas_call(
        _temporal_fwd_kernel,
        out_shape=[shape, shape, shape],
        grid=(n,),
        in_specs=in_specs,
        out_specs=[seq_spec, seq_spec, seq_spec],
        interpret=interpret,
    )(x3d, *weights)
    return out, (x3d, x1p, attp)


def _temporal_bwd_impl(res, dout, weights, interpret):
    x3d, x1p, attp = res
    n, length, _ = x3d.shape
    seq_spec = pl.BlockSpec((1, length, DIM), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [seq_spec] * 4 + [_const_spec(w.shape) for w in weights]
    out_shapes = [jax.ShapeDtypeStruct((n, length, DIM), x3d.dtype)]
    out_specs = [seq_spec]
    for shape in _DW_SHAPES:
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
        out_specs.append(_const_spec(shape))
    outs = pl.pallas_call(
        _temporal_bwd_kernel,
        out_shape=out_shapes,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x3d, x1p, attp, dout, *weights)
    return outs[0], outs[1:]


def _temporal_slab_fwd_impl(x_slab, weights, interpret):
    n, length, width = x_slab.shape
    spec = pl.BlockSpec((1, length, width), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec] + [_const_spec(w.shape) for w in weights]
    shape = jax.ShapeDtypeStruct((n, length, width), x_slab.dtype)
    out, x1p, attp = pl.pallas_call(
        _temporal_slab_fwd_kernel,
        out_shape=[shape, shape, shape],
        grid=(n,),
        in_specs=in_specs,
        out_specs=[spec, spec, spec],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_slab, *weights)
    return out, (x_slab, x1p, attp)


def _temporal_slab_bwd_impl(res, dout, weights, interpret):
    x_slab, x1p, attp = res
    n, length, width = x_slab.shape
    spec = pl.BlockSpec((1, length, width), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec] * 4 + [_const_spec(w.shape) for w in weights]
    out_shapes = [jax.ShapeDtypeStruct((n, length, width), x_slab.dtype)]
    out_specs = [spec]
    for shape in _DW_SHAPES:
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
        out_specs.append(_const_spec(shape))
    outs = pl.pallas_call(
        _temporal_slab_bwd_kernel,
        out_shape=out_shapes,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x_slab, x1p, attp, dout, *weights)
    return outs[0], outs[1:]


def _cast_dws(dws, weights):
    """f32 accumulators -> cotangents matching the primal weight
    shapes/dtypes ((1, n) rows stay (1, n))."""
    return tuple(
        dw.reshape(w.shape).astype(w.dtype) for dw, w in zip(dws, weights)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def spatial_block_train(x_flat, w0, w1, w2, w3, w4, w5, w6, w7, w8, w9,
                        w10, w11, interpret=False):
    """Differentiable fused spatial sub-block on flat (n*17, 256) rows.

    Forward AND backward are Pallas kernels; weight grads are accumulated
    across grid cells inside the backward kernel.
    """
    out, _ = _spatial_fwd_impl(
        x_flat, (w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11),
        interpret)
    return out


def _sbt_bwd(interpret, res, g):
    saved, weights = res
    dx, dws = _spatial_bwd_impl(saved, g, weights, interpret)
    return (dx, *_cast_dws(dws, weights))


def _sbt_fwd_wrapped(x_flat, w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10,
                     w11, interpret):
    weights = (w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11)
    out, saved = _spatial_fwd_impl(x_flat, weights, interpret)
    return out, (saved, weights)


spatial_block_train.defvjp(_sbt_fwd_wrapped, _sbt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def temporal_block_train(x3d, w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10,
                         w11, interpret=False):
    """Differentiable fused temporal sub-block: one (clip, joint)
    sequence per grid cell, full attention over the clip length."""
    out, _ = _temporal_fwd_impl(
        x3d, (w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11), interpret)
    return out


def _tbt_fwd(x3d, w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11,
             interpret):
    weights = (w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11)
    out, saved = _temporal_fwd_impl(x3d, weights, interpret)
    return out, (saved, weights)


def _tbt_bwd(interpret, res, g):
    saved, weights = res
    dx, dws = _temporal_bwd_impl(saved, g, weights, interpret)
    return (dx, *_cast_dws(dws, weights))


temporal_block_train.defvjp(_tbt_fwd, _tbt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def temporal_slab_train(x_slab, w0, w1, w2, w3, w4, w5, w6, w7, w8, w9,
                        w10, w11, interpret=False):
    """Differentiable fused temporal sub-block in frame-major slab layout
    (n_clips, L, 17*256) — forward and backward are Pallas kernels; no
    layout change from the spatial kernel's flat rows (reshape only)."""
    out, _ = _temporal_slab_fwd_impl(
        x_slab, (w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11),
        interpret)
    return out


def _tst_fwd(x_slab, w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11,
             interpret):
    weights = (w0, w1, w2, w3, w4, w5, w6, w7, w8, w9, w10, w11)
    out, saved = _temporal_slab_fwd_impl(x_slab, weights, interpret)
    return out, (saved, weights)


def _tst_bwd(interpret, res, g):
    saved, weights = res
    dx, dws = _temporal_slab_bwd_impl(saved, g, weights, interpret)
    return (dx, *_cast_dws(dws, weights))


temporal_slab_train.defvjp(_tst_fwd, _tst_bwd)


def temporal_train_forward_fused(params, clips, *, n_blocks=5, clip_len=243,
                                 interpret=False):
    """Differentiable fully-fused TemporalLifter forward for TRAINING.

    Same value contract as ``TemporalLifter().apply(..., train=True)`` for
    the default architecture (17 joints, hidden 256, heads 8): embed + PE
    and the output head run in XLA on flat rows; every SpatioTemporalBlock
    runs as two fused Pallas sub-blocks whose custom_vjp backward is ALSO
    a Pallas kernel (remat-in-kernel: only block inputs are saved).
    clips: (B, T, 17, 2) f32, T == clip_len. Returns (B, T, 17, 3) f32.
    """
    b, t, j, _ = clips.shape
    if j != N_JOINTS or t != clip_len:
        raise ValueError(f"expected (B, {clip_len}, {N_JOINTS}, 2), got "
                         f"{clips.shape}")
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    x = clips.reshape(b * t * j, 2).astype(dt)
    w_e = jnp.asarray(params["Dense_0"]["kernel"], dt)
    b_e = jnp.asarray(params["Dense_0"]["bias"], dt)
    tokens = x @ w_e + b_e
    pe = (jnp.asarray(params["spatial_pe"], dt)[0, 0][None]
          + jnp.asarray(params["temporal_pe"], dt)[0, :t][:, None])
    tokens = tokens + jnp.tile(pe.reshape(t * j, DIM), (b, 1))

    def pack(block_params, packer):
        return packer(block_params, dtype=dt)

    for blk in range(n_blocks):
        bp = params[f"SpatioTemporalBlock_{blk}"]
        tokens = spatial_block_train(
            tokens, *pack(bp, pack_spatial_weights), interpret)
        # slab kernel: same bytes as the flat rows (reshape only) — the
        # old joint-major regrouping cost ten XLA transposes per forward
        # and ten more in the backward
        xt = temporal_slab_train(
            tokens.reshape(b, t, j * DIM),
            *pack(bp, pack_temporal_weights), interpret)
        tokens = xt.reshape(b * t * j, DIM)

    gf = jnp.asarray(params["LayerNorm_0"]["scale"], jnp.float32)
    bf = jnp.asarray(params["LayerNorm_0"]["bias"], jnp.float32)
    xhat, _ = _ln_fwd_stats(tokens)
    y = (xhat * gf + bf).astype(dt)
    y = y @ jnp.asarray(params["Dense_1"]["kernel"], dt) \
        + jnp.asarray(params["Dense_1"]["bias"], dt)
    y = jnp.maximum(y, 0)
    y = (y @ jnp.asarray(params["Dense_2"]["kernel"], dt)
         + jnp.asarray(params["Dense_2"]["bias"], dt)).astype(jnp.float32)
    return y.reshape(b, t, j, 3)


def make_fused_train_apply(n_blocks=5, clip_len=243, interpret=False):
    """TrainState.apply_fn adapter: (variables, x, train=..., rngs=...) ->
    fused differentiable forward (the model has no batch_stats/dropout)."""
    def apply_fn(variables, x, train=False, rngs=None, mutable=None):
        del train, rngs, mutable
        return temporal_train_forward_fused(
            variables["params"], x, n_blocks=n_blocks, clip_len=clip_len,
            interpret=interpret)

    return apply_fn
