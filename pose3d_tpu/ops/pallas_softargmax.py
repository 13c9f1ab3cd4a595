"""Pallas TPU kernel: fused volumetric soft-argmax (logits -> coordinates).

The XLA formulation (pose3d_tpu.ops.heatmap.soft_argmax_3d) materializes the
(B, J, 64^3) softmax tensor in HBM and reads it back for the marginal
reductions — ~2x the volume's HBM traffic. This kernel keeps one joint's
64^3 volume in VMEM (1 MB f32) and produces the three expectations in a
single pass: max -> exp -> normalizing sum and the three index-weighted sums,
all fused on the VPU. HBM traffic drops to exactly one read of the logits
and a 3-float write per joint (speed-of-light for this op).

Backward of the legacy (N,d,h,w) kernel is pure recompute-XLA (custom_vjp):
dcoord/dlogit = p * (idx - E), cheap relative to the backbone and fully fused
by XLA.

NHWC-native variant (``soft_argmax_3d_nhwc_pallas``): consumes the conv
head's (B, H, W, J*D) output in its NATIVE layout — each (batch, joint) grid
cell reads the contiguous channel slice [j*D, (j+1)*D) — so neither forward
nor backward pays the (B,J,D,H,W) transpose. Both directions are fused
single-pass Pallas kernels: forward reads the volume once and writes 3
floats; backward reads the volume once (softmax recompute in VMEM) and
writes the gradient once, dx = p * (g . (idx - E)) / 1 — speed-of-light
HBM traffic in both directions. This is the training-path decode for
``PoseNet3D`` on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, out_ref, *, d, h, w):
    # flatten to 2D: Mosaic vectors are 2D (sublane x lane); row index r
    # encodes (depth, height) as r = di*h + hi
    x = x_ref[0].astype(jnp.float32).reshape(d * h, w)
    m = jnp.max(x)
    p = jnp.exp(x - m)
    s = jnp.sum(p)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d * h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (d * h, w), 0)
    inv = 1.0 / s
    ex = jnp.sum(p * cols.astype(jnp.float32)) * inv
    ey = jnp.sum(p * (rows % h).astype(jnp.float32)) * inv
    ez = jnp.sum(p * (rows // h).astype(jnp.float32)) * inv
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    vec = (
        jnp.where(lane == 0, ex, 0.0)
        + jnp.where(lane == 1, ey, 0.0)
        + jnp.where(lane == 2, ez, 0.0)
    )
    out_ref[0] = vec


def _expectations_fwd(logits_flat, d, h, w, interpret):
    """(N, d, h, w) -> (N, 3) raw index expectations [Ex, Ey, Ez]."""
    n = logits_flat.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, d=d, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, 1, 128), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, d, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # (1, 1, 128) block: the trailing (1, 128) tile satisfies the TPU
        # sublane/lane constraints for every grid position
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(logits_flat)
    return out[:, 0, :3]


def _expectations_xla(logits_flat):
    """Reference XLA path (used for backward recompute and CPU fallback)."""
    n, d, h, w = logits_flat.shape
    x = logits_flat.reshape(n, -1).astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1).reshape(n, d, h, w)
    ex = jnp.einsum("ndhw,w->n", p, jnp.arange(w, dtype=jnp.float32))
    ey = jnp.einsum("ndhw,h->n", p, jnp.arange(h, dtype=jnp.float32))
    ez = jnp.einsum("ndhw,d->n", p, jnp.arange(d, dtype=jnp.float32))
    return jnp.stack([ex, ey, ez], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _expectations(logits_flat, interpret):
    return _expectations_fwd(
        logits_flat, *logits_flat.shape[1:], interpret=interpret
    )


def _vjp_fwd(logits_flat, interpret):
    e = _expectations(logits_flat, interpret)
    return e, (logits_flat, e)


def _vjp_bwd(interpret, res, g):
    logits_flat, e = res
    n, d, h, w = logits_flat.shape
    p = jax.nn.softmax(
        logits_flat.reshape(n, -1).astype(jnp.float32), axis=-1
    ).reshape(n, d, h, w)
    wi = jnp.arange(w, dtype=jnp.float32)
    hi = jnp.arange(h, dtype=jnp.float32)
    di = jnp.arange(d, dtype=jnp.float32)
    # dE_x/dx_j = p_j (w_j - E_x); combine the three cotangents in one pass
    term = (
        g[:, 0, None, None, None] * (wi[None, None, None, :] - e[:, 0, None, None, None])
        + g[:, 1, None, None, None] * (hi[None, None, :, None] - e[:, 1, None, None, None])
        + g[:, 2, None, None, None] * (di[None, :, None, None] - e[:, 2, None, None, None])
    )
    return (p * term).astype(logits_flat.dtype),


_expectations.defvjp(_vjp_fwd, _vjp_bwd)


# the f32 pair-backward's vector temporaries need ~20 MB of scoped VMEM
# (default limit 16 MB); the v5e has 128 MB
_VMEM_BUDGET = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _lane_select(vec, lane, i):
    """Scalar at lane ``i`` of a (1, 128) vector (Mosaic-safe extraction)."""
    return jnp.sum(jnp.where(lane == i, vec, 0.0))


def _row_index_cols(h, w):
    """(h*w, 1) float32 row-coordinate columns: xi = r % w, yi = r // w."""
    r = jax.lax.broadcasted_iota(jnp.int32, (h * w, 1), 0)
    return (r % w).astype(jnp.float32), (r // w).astype(jnp.float32)


def _kernel_nhwc_fwd(x_ref, out_ref, *, h, w, d):
    # One joint's (h, w, d) volume, channel-contiguous in the conv head's
    # NHWC output, flattened to (h*w, d): rows encode (hi, wi), lanes depth.
    # Structure: every whole-array op is a single elementwise pass or a
    # sublane (row) reduction to a (1, d) vector; all finishing arithmetic
    # happens on (1, d) vectors, so the VPU work per element stays minimal.
    x = x_ref[0].astype(jnp.float32).reshape(h * w, d)
    m = jnp.max(x)
    p = jnp.exp(x - m)
    xi, yi = _row_index_cols(h, w)
    s_lane = jnp.sum(p, axis=0, keepdims=True)           # (1, d)
    sx_lane = jnp.sum(p * xi, axis=0, keepdims=True)
    sy_lane = jnp.sum(p * yi, axis=0, keepdims=True)
    dlane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1).astype(jnp.float32)
    inv = 1.0 / jnp.sum(s_lane)
    ex = jnp.sum(sx_lane) * inv
    ey = jnp.sum(sy_lane) * inv
    ez = jnp.sum(s_lane * dlane) * inv
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[0, 0] = (
        jnp.where(lane == 0, ex, 0.0)
        + jnp.where(lane == 1, ey, 0.0)
        + jnp.where(lane == 2, ez, 0.0)
    )


def _kernel_nhwc_bwd(x_ref, ge_ref, dx_ref, *, h, w, d):
    # One fused pass: recompute the softmax in VMEM, then
    # dx = p * (gx*(xi-Ex) + gy*(yi-Ey) + gz*(di-Ez))
    #    = (p/s) * (gx*xi + gy*yi + C(lane)),  all coefficients per-lane.
    x = x_ref[0].astype(jnp.float32).reshape(h * w, d)
    m = jnp.max(x)
    p = jnp.exp(x - m)
    s = jnp.sum(p)
    ge = ge_ref[0, 0].astype(jnp.float32)  # (1, 128): lanes 0-2 g, 3-5 E
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    gx, gy, gz = (_lane_select(ge, sel, i) for i in range(3))
    ex, ey, ez = (_lane_select(ge, sel, i) for i in range(3, 6))
    dlane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1).astype(jnp.float32)
    c = gz * (dlane - ez) - gx * ex - gy * ey            # (1, d)
    xi, yi = _row_index_cols(h, w)
    term = xi * gx + yi * gy + c                          # broadcasts to full
    dx_ref[0] = ((p / s) * term).reshape(h, w, d).astype(dx_ref.dtype)


def _kernel_nhwc_pair_fwd(x_ref, out_ref, *, h, w, d):
    # TWO joints per cell: Mosaic requires the last block dim to be a
    # multiple of 128, and one joint's depth is 64 — so each grid cell reads
    # a contiguous 2-joint channel slab (128 lanes) and runs a dual softmax
    # whose left/right masking happens ONLY on (1, 128) per-lane vectors
    # (lanes < d belong to joint 2k, the rest to joint 2k+1).
    x = x_ref[0].astype(jnp.float32).reshape(h * w, 2 * d)
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    left_v = lane_v < d
    neg = jnp.float32(-1e30)
    mx = jnp.max(x, axis=0, keepdims=True)               # (1, 2d)
    m_l = jnp.max(jnp.where(left_v, mx, neg))
    m_r = jnp.max(jnp.where(left_v, neg, mx))
    p = jnp.exp(x - jnp.where(left_v, m_l, m_r))
    xi, yi = _row_index_cols(h, w)
    s_lane = jnp.sum(p, axis=0, keepdims=True)           # (1, 2d)
    sx_lane = jnp.sum(p * xi, axis=0, keepdims=True)
    sy_lane = jnp.sum(p * yi, axis=0, keepdims=True)
    dlane = (lane_v % d).astype(jnp.float32)
    zero = jnp.float32(0.0)
    inv_l = 1.0 / jnp.sum(jnp.where(left_v, s_lane, zero))
    inv_r = 1.0 / jnp.sum(jnp.where(left_v, zero, s_lane))
    vals = (
        jnp.sum(jnp.where(left_v, sx_lane, zero)) * inv_l,
        jnp.sum(jnp.where(left_v, sy_lane, zero)) * inv_l,
        jnp.sum(jnp.where(left_v, s_lane * dlane, zero)) * inv_l,
        jnp.sum(jnp.where(left_v, zero, sx_lane)) * inv_r,
        jnp.sum(jnp.where(left_v, zero, sy_lane)) * inv_r,
        jnp.sum(jnp.where(left_v, zero, s_lane * dlane)) * inv_r,
    )
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc = jnp.zeros((1, 128), jnp.float32)
    for i, v in enumerate(vals):
        acc = acc + jnp.where(out_lane == i, v, 0.0)
    out_ref[0, 0] = acc


def _kernel_nhwc_pair_bwd(x_ref, ge_ref, dx_ref, *, h, w, d):
    # dx for a 2-joint slab in one pass. Everything joint-specific is folded
    # into three per-lane coefficient vectors:
    #   dx = (p * inv_sel) * (xi * gxv + yi * gyv + Cv)
    x = x_ref[0].astype(jnp.float32).reshape(h * w, 2 * d)
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    left_v = lane_v < d
    neg = jnp.float32(-1e30)
    mx = jnp.max(x, axis=0, keepdims=True)
    m_l = jnp.max(jnp.where(left_v, mx, neg))
    m_r = jnp.max(jnp.where(left_v, neg, mx))
    p = jnp.exp(x - jnp.where(left_v, m_l, m_r))
    s_lane = jnp.sum(p, axis=0, keepdims=True)
    zero = jnp.float32(0.0)
    inv_l = 1.0 / jnp.sum(jnp.where(left_v, s_lane, zero))
    inv_r = 1.0 / jnp.sum(jnp.where(left_v, zero, s_lane))
    ge = ge_ref[0, 0].astype(jnp.float32)  # lanes: g_l(3) e_l(3) g_r(3) e_r(3)
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    (gx_l, gy_l, gz_l, ex_l, ey_l, ez_l,
     gx_r, gy_r, gz_r, ex_r, ey_r, ez_r) = (
        _lane_select(ge, sel, i) for i in range(12)
    )
    dlane = (lane_v % d).astype(jnp.float32)
    gxv = jnp.where(left_v, gx_l, gx_r)                  # (1, 2d)
    gyv = jnp.where(left_v, gy_l, gy_r)
    cv = jnp.where(
        left_v,
        gz_l * (dlane - ez_l) - gx_l * ex_l - gy_l * ey_l,
        gz_r * (dlane - ez_r) - gx_r * ex_r - gy_r * ey_r,
    )
    pn = p * jnp.where(left_v, inv_l, inv_r)
    xi, yi = _row_index_cols(h, w)
    dx = pn * (xi * gxv + yi * gyv + cv)
    dx_ref[0] = dx.reshape(h, w, 2 * d).astype(dx_ref.dtype)



def _nhwc_strategy(num_joints, d, interpret):
    """'simple' (one joint/cell) is only legal on real TPU when d % 128 == 0
    or the grid covers exactly one joint; 'pairs' covers d == 64 (2 joints =
    128 lanes) with a single-joint tail call when J is odd."""
    if interpret or d % 128 == 0:
        return "simple"
    if (2 * d) % 128 == 0 and num_joints >= 2:
        return "pairs"
    return "xla"


def _simple_fwd_call(logits, b, h, w, d, num_joints, interpret):
    return pl.pallas_call(
        functools.partial(_kernel_nhwc_fwd, h=h, w=w, d=d),
        out_shape=jax.ShapeDtypeStruct((b, num_joints, 1, 128), jnp.float32),
        grid=(b, num_joints),
        in_specs=[
            pl.BlockSpec((1, h, w, d), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        # trailing (1, 128) block == the array's own trailing dims (the TPU
        # lowering requires block dims divisible by (8, 128) or exactly equal)
        out_specs=pl.BlockSpec((1, 1, 1, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(logits)[:, :, 0, :3]


def _simple_bwd_call(logits, ge, b, h, w, d, num_joints, interpret):
    return pl.pallas_call(
        functools.partial(_kernel_nhwc_bwd, h=h, w=w, d=d),
        out_shape=jax.ShapeDtypeStruct(logits.shape, logits.dtype),
        grid=(b, num_joints),
        in_specs=[
            pl.BlockSpec((1, h, w, d), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, d), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_BUDGET,
        interpret=interpret,
    )(logits, ge)


def _expectations_nhwc_fwd(logits_nhwc, num_joints, interpret, strategy):
    b, h, w, c = logits_nhwc.shape
    d = c // num_joints
    assert strategy in ("simple", "pairs"), strategy
    if strategy == "simple":
        return _simple_fwd_call(logits_nhwc, b, h, w, d, num_joints,
                                interpret)
    npairs = num_joints // 2
    # the pair grid addresses 128-wide channel blocks of the FULL array;
    # channels past 2*npairs*d are simply never read by it
    out = pl.pallas_call(
        functools.partial(_kernel_nhwc_pair_fwd, h=h, w=w, d=d),
        out_shape=jax.ShapeDtypeStruct((b, npairs, 1, 128), jnp.float32),
        grid=(b, npairs),
        in_specs=[
            pl.BlockSpec((1, h, w, 2 * d), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(logits_nhwc)
    e = out[:, :, 0, :6].reshape(b, npairs * 2, 3)
    if num_joints % 2:
        # odd tail joint: tiny slice (1/J of the volume), then a legal
        # single-joint call (block last dim == sliced array's last dim)
        tail = logits_nhwc[..., npairs * 2 * d:]
        e_tail = _simple_fwd_call(tail, b, h, w, d, 1, interpret)
        e = jnp.concatenate([e, e_tail], axis=1)
    return e  # (B, J, 3) raw [Ex, Ey, Ez]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _expectations_nhwc(logits_nhwc, num_joints, interpret, strategy):
    return _expectations_nhwc_fwd(logits_nhwc, num_joints, interpret, strategy)


def _nhwc_vjp_fwd(logits_nhwc, num_joints, interpret, strategy):
    e = _expectations_nhwc(logits_nhwc, num_joints, interpret, strategy)
    return e, (logits_nhwc, e)


def _pack_ge(g, e):
    """(B, J, 3)+(B, J, 3) -> (B, J, 1, 128) [g, E] zero-padded lanes."""
    ge = jnp.concatenate([g.astype(jnp.float32), e], axis=-1)
    ge = jnp.pad(ge, ((0, 0), (0, 0), (0, 128 - ge.shape[-1])))
    return ge[:, :, None, :]


def _nhwc_vjp_bwd(num_joints, interpret, strategy, res, g):
    logits_nhwc, e = res
    b, h, w, c = logits_nhwc.shape
    d = c // num_joints
    if strategy == "simple":
        dx = _simple_bwd_call(logits_nhwc, _pack_ge(g, e), b, h, w, d,
                              num_joints, interpret)
        return (dx,)
    npairs = num_joints // 2
    # per-pair lanes: g_left(3) e_left(3) g_right(3) e_right(3)
    ge = jnp.concatenate(
        [g[:, :, None, :].astype(jnp.float32), e[:, :, None, :]], axis=2
    ).reshape(b, num_joints, 6)
    ge_main = ge[:, : npairs * 2].reshape(b, npairs, 12)
    ge_main = jnp.pad(ge_main, ((0, 0), (0, 0), (0, 128 - 12)))[:, :, None, :]
    dx_main = pl.pallas_call(
        functools.partial(_kernel_nhwc_pair_bwd, h=h, w=w, d=d),
        out_shape=jax.ShapeDtypeStruct((b, h, w, npairs * 2 * d),
                                       logits_nhwc.dtype),
        grid=(b, npairs),
        in_specs=[
            pl.BlockSpec((1, h, w, 2 * d), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 128), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, 2 * d), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=_VMEM_BUDGET,
        interpret=interpret,
    )(logits_nhwc, ge_main)
    if num_joints % 2 == 0:
        return (dx_main,)
    tail = logits_nhwc[..., npairs * 2 * d:]
    dx_tail = _simple_bwd_call(
        tail, _pack_ge(g[:, -1:], e[:, -1:]), b, h, w, d, 1, interpret
    )
    return (jnp.concatenate([dx_main, dx_tail], axis=-1),)


_expectations_nhwc.defvjp(_nhwc_vjp_fwd, _nhwc_vjp_bwd)


def soft_argmax_3d_nhwc_pallas(logits_nhwc, num_joints: int = 17,
                               depth: int = 64, z_scale: float = 2.5,
                               xy_scale: float = 2.0,
                               interpret: bool | None = None,
                               strategy: str | None = None):
    """Drop-in fused replacement for ops.heatmap.soft_argmax_3d_nhwc —
    transpose-free decode straight off the conv head's (B,H,W,J*D) output,
    with a fused Pallas backward (trainable). Returns (B, J*3) coords with
    the reference scaling (Model.py:175-177)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = logits_nhwc.shape
    assert c == num_joints * depth, (logits_nhwc.shape, num_joints, depth)
    if strategy is None:
        strategy = _nhwc_strategy(num_joints, depth, interpret)
    if strategy == "xla":
        # no legal TPU tiling for this (J, depth): XLA decode, same math
        from pose3d_tpu.ops.heatmap import soft_argmax_3d_nhwc

        return soft_argmax_3d_nhwc(logits_nhwc, num_joints, depth,
                                   z_scale=z_scale, xy_scale=xy_scale)
    e = _expectations_nhwc(logits_nhwc, num_joints, interpret, strategy)
    cx = (e[..., 0] / w - 0.5) * xy_scale
    cy = (e[..., 1] / h - 0.5) * xy_scale
    cz = (e[..., 2] / depth - 0.5) * z_scale
    return jnp.stack([cx, cy, cz], axis=-1).reshape(b, num_joints * 3)


def soft_argmax_3d_pallas(logits, num_joints: int = 17, depth: int = 64,
                          height: int = 64, width: int = 64,
                          z_scale: float = 2.5, xy_scale: float = 2.0,
                          interpret: bool | None = None):
    """Drop-in fused replacement for ops.heatmap.soft_argmax_3d (coords only;
    use the XLA op when the normalized heatmap output is needed).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = logits.shape[0]
    flat = logits.reshape(b * num_joints, depth, height, width)
    e = _expectations(flat, interpret)  # (N,3) [Ex,Ey,Ez]
    e = e.reshape(b, num_joints, 3)
    cx = (e[..., 0] / width - 0.5) * xy_scale
    cy = (e[..., 1] / height - 0.5) * xy_scale
    cz = (e[..., 2] / depth - 0.5) * z_scale
    return jnp.stack([cx, cy, cz], axis=-1).reshape(b, num_joints * 3)
