"""Pallas TPU kernel: final 1x1 conv fused with volumetric soft-argmax.

The direct model's epilogue (reference Model.py:139-182) is
``1x1 conv (256 -> J*D channels) -> softmax over D*H*W -> marginal
expectations``. Run separately (even with the fused NHWC decode of
pose3d_tpu.ops.pallas_softargmax), the (B, 64, 64, 1088) logits tensor makes
a full HBM round trip in the forward and its gradient makes another in the
backward — at B=64 bf16 that is ~570 MB per direction per pass, the single
largest intermediate in the train step.

This module fuses the conv INTO the decode so the logits never exist in HBM:

- forward (``grid=(B,)``): each cell reads one sample's (H, W, C) features
  once, loads the (C, J*D) conv weight (lane-padded to a multiple of 128),
  and for each 128-lane pair-of-joints slab computes
  ``logits_slab = feats @ W_slab + b_slab`` on the MXU directly into VMEM,
  then runs the dual-joint softmax/expectation math of
  pose3d_tpu.ops.pallas_softargmax on the slab. HBM traffic: one read of the
  features + the weights, 6 floats per pair out (vs read feats + write
  logits + read logits).
- backward (``grid=(B,)``, single kernel, three outputs): recomputes each
  slab and its softmax in VMEM, forms ``dslab = p/s * (xi gx + yi gy + C)``
  (the exact pair-backward algebra of pallas_softargmax), then
    dfeats  = sum_p dslab_p @ W_p^T   (written once per cell)
    dW_p   += feats^T @ dslab_p       (VMEM-accumulated across the batch
    db_p   += sum_rows dslab_p         grid steps — consecutive revisits)
  HBM traffic: one read of the features, one write of dfeats, one write of
  dW/db (vs write dlogits + read dlogits twice + re-read feats).

The odd 17th joint rides in the last slab's right half: the weight columns
are zero-padded and the bias padded with -1e30 (so the pad half's softmax is
a harmless constant) and its cotangent lanes are zero, which makes every pad
contribution to dfeats/dW/db exactly zero.

Used by ``PoseNet3D(fuse_final_conv=True)``; parity and gradient tests run
this in interpret mode on CPU (tests/test_pallas_conv_decode.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _row_index_cols(h, w):
    r = jax.lax.broadcasted_iota(jnp.int32, (h * w, 1), 0)
    return (r % w).astype(jnp.float32), (r // w).astype(jnp.float32)


def _lane_select(vec, lane, i):
    return jnp.sum(jnp.where(lane == i, vec, 0.0))


def _pair_softmax(slab, d):
    """Dual-joint masked softmax pieces for a (rows, 2d) f32 slab.

    Returns (p, left_v, lane_v, inv_l, inv_r): un-normalized exp, the
    left-half lane mask, the lane iota, and the two normalizers.

    The masking sentinel must be strictly below ANY possible logit —
    including the -1e30 pad bias — or the per-half max picks the sentinel
    instead of the true max, every exp in that half underflows to 0, and
    the normalizer turns into inf (0 * inf = NaN in the backward). f32 min
    guarantees the sentinel never wins.
    """
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    left_v = lane_v < d
    mx = jnp.max(slab, axis=0, keepdims=True)
    m_l = jnp.max(jnp.where(left_v, mx, neg))
    m_r = jnp.max(jnp.where(left_v, neg, mx))
    p = jnp.exp(slab - jnp.where(left_v, m_l, m_r))
    s_lane = jnp.sum(p, axis=0, keepdims=True)
    zero = jnp.float32(0.0)
    inv_l = 1.0 / jnp.sum(jnp.where(left_v, s_lane, zero))
    inv_r = 1.0 / jnp.sum(jnp.where(left_v, zero, s_lane))
    return p, left_v, lane_v, inv_l, inv_r


def _slab(feats, w_ref, b_ref, p_idx):
    """logits slab for 128-lane block ``p_idx``: feats @ W_p + b_p (f32)."""
    wp = w_ref[:, p_idx * 128:(p_idx + 1) * 128]
    out = jax.lax.dot_general(
        feats, wp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # keep the bias slice 2-D ((1, 128)) — Mosaic lowering rejects 1-D
    # vector intermediates on real TPU
    return out + b_ref[:, p_idx * 128:(p_idx + 1) * 128].astype(jnp.float32)


def _fwd_kernel(f_ref, w_ref, b_ref, out_ref, *, h, w, d, npads):
    feats = f_ref[0].reshape(h * w, f_ref.shape[-1])
    xi, yi = _row_index_cols(h, w)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for pi in range(npads):
        slab = _slab(feats, w_ref, b_ref, pi)
        p, left_v, lane_v, inv_l, inv_r = _pair_softmax(slab, d)
        s_lane = jnp.sum(p, axis=0, keepdims=True)
        sx_lane = jnp.sum(p * xi, axis=0, keepdims=True)
        sy_lane = jnp.sum(p * yi, axis=0, keepdims=True)
        dlane = (lane_v % d).astype(jnp.float32)
        zero = jnp.float32(0.0)
        vals = (
            jnp.sum(jnp.where(left_v, sx_lane, zero)) * inv_l,
            jnp.sum(jnp.where(left_v, sy_lane, zero)) * inv_l,
            jnp.sum(jnp.where(left_v, s_lane * dlane, zero)) * inv_l,
            jnp.sum(jnp.where(left_v, zero, sx_lane)) * inv_r,
            jnp.sum(jnp.where(left_v, zero, sy_lane)) * inv_r,
            jnp.sum(jnp.where(left_v, zero, s_lane * dlane)) * inv_r,
        )
        acc = jnp.zeros((1, 128), jnp.float32)
        for i, v in enumerate(vals):
            acc = acc + jnp.where(out_lane == i, v, 0.0)
        out_ref[0, pi] = acc


def _bwd_kernel(f_ref, w_ref, b_ref, ge_ref, df_ref, dw_ref, db_ref,
                *, h, w, d, npads):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    c = f_ref.shape[-1]
    feats = f_ref[0].reshape(h * w, c)
    xi, yi = _row_index_cols(h, w)
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dfeats = jnp.zeros((h * w, c), jnp.float32)
    for pi in range(npads):
        slab = _slab(feats, w_ref, b_ref, pi)
        p, left_v, lane_v, inv_l, inv_r = _pair_softmax(slab, d)
        ge = ge_ref[0, pi].astype(jnp.float32)  # (1,128): gL eL gR eR
        (gx_l, gy_l, gz_l, ex_l, ey_l, ez_l,
         gx_r, gy_r, gz_r, ex_r, ey_r, ez_r) = (
            _lane_select(ge, sel, k) for k in range(12)
        )
        dlane = (lane_v % d).astype(jnp.float32)
        gxv = jnp.where(left_v, gx_l, gx_r)
        gyv = jnp.where(left_v, gy_l, gy_r)
        cv = jnp.where(
            left_v,
            gz_l * (dlane - ez_l) - gx_l * ex_l - gy_l * ey_l,
            gz_r * (dlane - ez_r) - gx_r * ex_r - gy_r * ey_r,
        )
        pn = p * jnp.where(left_v, inv_l, inv_r)
        dslab = pn * (xi * gxv + yi * gyv + cv)        # (h*w, 2d) f32
        wp = w_ref[:, pi * 128:(pi + 1) * 128]
        dfeats = dfeats + jax.lax.dot_general(
            dslab, wp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_ref[:, pi * 128:(pi + 1) * 128] += jax.lax.dot_general(
            feats, dslab, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw_ref.dtype)
        db_ref[:, pi * 128:(pi + 1) * 128] += jnp.sum(
            dslab, axis=0, keepdims=True).astype(db_ref.dtype)
    df_ref[0] = dfeats.reshape(h, w, c).astype(df_ref.dtype)


def _pad_wb(kernel, bias, npads):
    """Zero-pad weight columns / -1e30-pad bias lanes to npads*128.

    The padded bias stays f32: rounding the -1e30 pad through a bf16 bias
    dtype would shift it to -1.0047e30, desynchronizing it from the exact
    f32 value the kernel's softmax masking reasons about (the round-4
    on-chip NaN). The kernel consumes the bias in f32 anyway.
    """
    c, oc = kernel.shape
    pad = npads * 128 - oc
    w_pad = jnp.pad(kernel, ((0, 0), (0, pad)))
    b_pad = jnp.pad(bias.astype(jnp.float32), (0, pad),
                    constant_values=-1e30)[None, :]
    return w_pad, b_pad


def _expectations_fused_fwd(feats, kernel, bias, num_joints, depth,
                            interpret):
    b, h, w, c = feats.shape
    npads = -(-(num_joints * depth) // 128)
    w_pad, b_pad = _pad_wb(kernel, bias, npads)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, d=depth, npads=npads),
        out_shape=jax.ShapeDtypeStruct((b, npads, 1, 128), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, npads * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npads * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npads, 1, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_BUDGET,
        interpret=interpret,
    )(feats, w_pad, b_pad)
    # per pair: lanes 0-2 left joint [Ex,Ey,Ez], 3-5 right joint
    e = out[:, :, 0, :6].reshape(b, npads * 2, 3)
    return e[:, :num_joints]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _expectations_fused(feats, kernel, bias, num_joints, depth, interpret):
    return _expectations_fused_fwd(feats, kernel, bias, num_joints, depth,
                                   interpret)


def _fused_vjp_fwd(feats, kernel, bias, num_joints, depth, interpret):
    e = _expectations_fused(feats, kernel, bias, num_joints, depth,
                            interpret)
    return e, (feats, kernel, bias, e)


def _fused_vjp_bwd(num_joints, depth, interpret, res, g):
    feats, kernel, bias, e = res
    b, h, w, c = feats.shape
    npads = -(-(num_joints * depth) // 128)
    w_pad, b_pad = _pad_wb(kernel, bias, npads)
    # pack per-pair cotangent lanes [gL(3) eL(3) gR(3) eR(3)]; pad joints
    # carry zero g, zero e -> dslab of the pad half is exactly zero
    pad_j = npads * 2 - num_joints
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, pad_j), (0, 0)))
    ep = jnp.pad(e, ((0, 0), (0, pad_j), (0, 0)))
    ge = jnp.concatenate([gp[:, :, None, :], ep[:, :, None, :]], axis=2)
    ge = ge.reshape(b, npads, 12)
    ge = jnp.pad(ge, ((0, 0), (0, 0), (0, 128 - 12)))[:, :, None, :]
    df, dw_pad, db_pad = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, d=depth, npads=npads),
        out_shape=(
            jax.ShapeDtypeStruct(feats.shape, feats.dtype),
            jax.ShapeDtypeStruct((c, npads * 128), jnp.float32),
            jax.ShapeDtypeStruct((1, npads * 128), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, npads * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npads * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npads, 1, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # dW/db: ONE block revisited on every grid step (consecutive),
            # accumulated in VMEM, written back once at the end
            pl.BlockSpec((c, npads * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npads * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_VMEM_BUDGET,
        interpret=interpret,
    )(feats, w_pad, b_pad, ge)
    oc = num_joints * depth
    return (df, dw_pad[:, :oc].astype(kernel.dtype),
            db_pad[0, :oc].astype(bias.dtype))


_expectations_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def conv_soft_argmax_3d_fused(feats, kernel, bias, num_joints: int = 17,
                              depth: int = 64, z_scale: float = 2.5,
                              xy_scale: float = 2.0,
                              interpret: bool | None = None):
    """Fused ``1x1-conv -> volumetric softmax -> soft-argmax`` decode.

    feats: (B, H, W, C) conv-head features (post BN+ReLU);
    kernel: (C, num_joints*depth) 1x1-conv weight; bias: (num_joints*depth,).
    Returns (B, num_joints*3) coords with the reference scaling
    (Model.py:175-177), differentiable wrt all three inputs. Equals
    ``soft_argmax_3d_nhwc(feats @ kernel + bias)`` without ever
    materializing the logits in HBM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = feats.shape
    assert kernel.shape == (c, num_joints * depth), (
        kernel.shape, c, num_joints, depth)
    e = _expectations_fused(feats, kernel, bias, num_joints, depth,
                            interpret)
    cx = (e[..., 0] / w - 0.5) * xy_scale
    cy = (e[..., 1] / h - 0.5) * xy_scale
    cz = (e[..., 2] / depth - 0.5) * z_scale
    return jnp.stack([cx, cy, cz], axis=-1).reshape(b, num_joints * 3)
