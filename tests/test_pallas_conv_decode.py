"""Parity of the fused 1x1-conv + soft-argmax decode (interpret mode).

Oracle: the unfused composition ``feats @ kernel + bias`` followed by
pose3d_tpu.ops.heatmap.soft_argmax_3d_nhwc — the exact epilogue of the
reference Model.py:139-182 as already proven against the live reference in
tests/test_reference_parity.py.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.ops.heatmap import soft_argmax_3d_nhwc
from pose3d_tpu.ops.pallas_conv_decode import conv_soft_argmax_3d_fused


def _setup(rng, b, h, w, c, j, d, dtype):
    feats = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    kernel = jnp.asarray(rng.standard_normal((c, j * d)) * 0.05, dtype)
    bias = jnp.asarray(rng.standard_normal(j * d) * 0.1, dtype)
    return feats, kernel, bias


def _oracle(feats, kernel, bias, j, d):
    logits = (feats.astype(jnp.float32) @ kernel.astype(jnp.float32)
              + bias.astype(jnp.float32))
    return soft_argmax_3d_nhwc(logits, j, d)


@pytest.mark.parametrize("j", [17, 4, 3])
def test_forward_parity(rng, j):
    b, h, w, c, d = 2, 8, 8, 128, 64
    feats, kernel, bias = _setup(rng, b, h, w, c, j, d, jnp.float32)
    want = np.asarray(_oracle(feats, kernel, bias, j, d))
    got = np.asarray(conv_soft_argmax_3d_fused(
        feats, kernel, bias, num_joints=j, depth=d, interpret=True))
    assert got.shape == (b, j * 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_forward_parity_bf16(rng):
    b, h, w, c, j, d = 2, 8, 8, 128, 17, 64
    feats, kernel, bias = _setup(rng, b, h, w, c, j, d, jnp.bfloat16)
    want = np.asarray(_oracle(feats, kernel, bias, j, d))
    got = np.asarray(conv_soft_argmax_3d_fused(
        feats, kernel, bias, num_joints=j, depth=d, interpret=True))
    # the fused path computes the logits in f32 from bf16 operands; the
    # oracle casts to f32 first — same class of rounding, coord-scale tol
    np.testing.assert_allclose(got, want, atol=5e-2)


@pytest.mark.parametrize("j", [17, 4, 3])
def test_gradient_parity(rng, j):
    b, h, w, c, d = 2, 8, 8, 128, 64
    feats, kernel, bias = _setup(rng, b, h, w, c, j, d, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, j * 3)), jnp.float32)

    def fused_loss(f, k, bb):
        out = conv_soft_argmax_3d_fused(f, k, bb, num_joints=j, depth=d,
                                        interpret=True)
        return jnp.vdot(out, cot)

    def oracle_loss(f, k, bb):
        return jnp.vdot(_oracle(f, k, bb, j, d), cot)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(feats, kernel, bias)
    go = jax.grad(oracle_loss, argnums=(0, 1, 2))(feats, kernel, bias)
    for got, want, name, tol in zip(
            gf, go, ("dfeats", "dkernel", "dbias"), (3e-5, 3e-5, 2e-5)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=tol,
            err_msg=f"{name} mismatch (j={j})")


def test_gradient_finite_bf16(rng):
    """Round-4 on-chip regression: with a bf16 bias the -1e30 pad used to
    round to -1.0047e30, below the f32 masking sentinel, making every pad
    exp underflow to 0 -> inf normalizer -> NaN dfeats (forward unaffected
    because the pad joint is sliced away). J=17 puts the pad in the last
    slab's right half, exactly the failing configuration."""
    b, h, w, c, j, d = 2, 8, 8, 128, 17, 64
    feats, kernel, bias = _setup(rng, b, h, w, c, j, d, jnp.bfloat16)
    cot = jnp.asarray(rng.standard_normal((b, j * 3)), jnp.float32)

    def fused_loss(f, k, bb):
        out = conv_soft_argmax_3d_fused(f, k, bb, num_joints=j, depth=d,
                                        interpret=True)
        return jnp.vdot(out, cot)

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(feats, kernel, bias)
    go = jax.grad(
        lambda f, k, bb: jnp.vdot(_oracle(f, k, bb, j, d), cot),
        argnums=(0, 1, 2))(feats, kernel, bias)
    for got, want, name in zip(gf, go, ("dfeats", "dkernel", "dbias")):
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        assert np.isfinite(got).all(), f"{name} has non-finite entries"
        scale = max(float(np.abs(want).max()), 1e-6)
        np.testing.assert_allclose(got, want, atol=2e-2 * scale,
                                   err_msg=f"{name} mismatch (bf16)")


def test_pad_joint_gets_no_gradient_leak(rng):
    """J=3 leaves a pad half in the second slab: its weight columns must
    receive exactly zero gradient (the pad cotangent lanes are zero)."""
    b, h, w, c, j, d = 1, 8, 8, 128, 3, 64
    feats, kernel, bias = _setup(rng, b, h, w, c, j, d, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, j * 3)), jnp.float32)

    def fused_loss(k):
        out = conv_soft_argmax_3d_fused(feats, k, bias, num_joints=j,
                                        depth=d, interpret=True)
        return jnp.vdot(out, cot)

    gk = jax.grad(fused_loss)(kernel)
    assert gk.shape == kernel.shape  # pad columns trimmed before return
    assert np.isfinite(np.asarray(gk)).all()


@pytest.mark.slow


def test_posenet3d_fused_route_matches_default(rng):
    """PoseNet3D(fuse_final_conv=True) shares the exact param tree with the
    default model and produces the same coords and parameter gradients."""
    from pose3d_tpu.models.heads import PoseNet3D

    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    kw = dict(architecture="resnet18", return_heatmap=False,
              use_pallas=False, num_joints=17, depth=64)
    base = PoseNet3D(**kw)
    fused = PoseNet3D(fuse_final_conv=True, **kw)
    variables = base.init({"params": jax.random.key(0)}, x, train=False)
    # identical param tree (the fused head binds Conv_0 via a 1-px call)
    fused_vars = fused.init({"params": jax.random.key(0)}, x, train=False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(fused_vars)

    want, _ = base.apply(variables, x, train=False)
    got, _ = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    y = jnp.asarray(rng.random((2, 17, 3)) - 0.5, jnp.float32)

    def loss(model, params):
        (coords, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"])
        return jnp.mean((coords.reshape(y.shape) - y) ** 2)

    g_want = jax.grad(lambda p: loss(base, p))(variables["params"])
    g_got = jax.grad(lambda p: loss(fused, p))(variables["params"])
    flat_w, _ = jax.flatten_util.ravel_pytree(g_want)
    flat_g, _ = jax.flatten_util.ravel_pytree(g_got)
    scale = float(jnp.max(jnp.abs(flat_w))) + 1e-12
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_w),
                               atol=5e-5 * max(scale, 1.0))
