"""Pallas TPU kernel: fused volumetric soft-argmax (logits -> coordinates).

The XLA formulation (pose3d_tpu.ops.heatmap.soft_argmax_3d) materializes the
(B, J, 64^3) softmax tensor in HBM and reads it back for the marginal
reductions — ~2x the volume's HBM traffic. This kernel keeps one joint's
64^3 volume in VMEM (1 MB f32) and produces the three expectations in a
single pass: max -> exp -> normalizing sum and the three index-weighted sums,
all fused on the VPU. HBM traffic drops to exactly one read of the logits
and a 3-float write per joint (speed-of-light for this op).

Backward is pure recompute-XLA (custom_vjp): dcoord/dlogit = p * (idx - E),
cheap relative to the backbone and fully fused by XLA.
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
