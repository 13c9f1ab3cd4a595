"""Pallas kernels vs XLA references (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.ops.heatmap import soft_argmax_3d, soft_argmax_3d_nhwc
from pose3d_tpu.ops.pallas_softargmax import (
    soft_argmax_3d_nhwc_pallas,
    soft_argmax_3d_pallas,
)


class TestFusedSoftArgmax:
    def test_matches_xla_forward(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((2, 17, 16, 16, 16)).astype(np.float32) * 3
        )
        got = soft_argmax_3d_pallas(logits, depth=16, height=16, width=16,
                                    interpret=True)
        want, _ = soft_argmax_3d(logits, depth=16, height=16, width=16,
                                 return_heatmap=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_matches_xla_backward(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((1, 17, 16, 16, 16)).astype(np.float32) * 2
        )

        def f_pallas(x):
            return jnp.sum(soft_argmax_3d_pallas(
                x, depth=16, height=16, width=16, interpret=True) ** 2)

        def f_xla(x):
            c, _ = soft_argmax_3d(x, depth=16, height=16, width=16,
                                  return_heatmap=False)
            return jnp.sum(c ** 2)

        g1 = jax.grad(f_pallas)(logits)
        g0 = jax.grad(f_xla)(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)

    def test_nonuniform_dims(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((2, 17, 8, 16, 32)).astype(np.float32)
        )
        got = soft_argmax_3d_pallas(logits, depth=8, height=16, width=32,
                                    interpret=True)
        want, _ = soft_argmax_3d(logits, depth=8, height=16, width=32,
                                 return_heatmap=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_z_scale_variants(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((1, 17, 16, 16, 16)).astype(np.float32)
        )
        for zs in (2.5, 2.0, 1.0):
            got = soft_argmax_3d_pallas(logits, depth=16, height=16, width=16,
                                        z_scale=zs, interpret=True)
            want, _ = soft_argmax_3d(logits, depth=16, height=16, width=16,
                                     z_scale=zs, return_heatmap=False)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)


class TestFusedSoftArgmaxNHWC:
    """Transpose-free NHWC kernel: fused forward AND fused Pallas backward."""

    def test_matches_xla_forward(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((2, 16, 16, 17 * 8)).astype(np.float32) * 3
        )
        got = soft_argmax_3d_nhwc_pallas(logits, depth=8, interpret=True)
        want = soft_argmax_3d_nhwc(logits, depth=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_matches_xla_backward(self, rng):
        """The fused Pallas backward kernel == XLA autodiff of the NHWC
        decode (VERDICT round-1 item 6: grad-parity test vs XLA)."""
        logits = jnp.asarray(
            rng.standard_normal((2, 16, 16, 17 * 8)).astype(np.float32) * 2
        )
        tgt = jnp.asarray(rng.standard_normal((2, 17 * 3)).astype(np.float32))

        def f_pallas(x):
            c = soft_argmax_3d_nhwc_pallas(x, depth=8, interpret=True)
            return jnp.sum((c - tgt) ** 2)

        def f_xla(x):
            return jnp.sum((soft_argmax_3d_nhwc(x, depth=8) - tgt) ** 2)

        g1 = jax.grad(f_pallas)(logits)
        g0 = jax.grad(f_xla)(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=5e-5)

    def test_matches_transpose_path(self, rng):
        """NHWC kernel == the (B,J,D,H,W) reference decode modulo layout."""
        b, h, w, j, d = 2, 16, 16, 17, 8
        nhwc = rng.standard_normal((b, h, w, j * d)).astype(np.float32)
        got = soft_argmax_3d_nhwc_pallas(jnp.asarray(nhwc), depth=d,
                                         interpret=True)
        lg = jnp.asarray(nhwc).transpose(0, 3, 1, 2).reshape(b, j, d, h, w)
        want, _ = soft_argmax_3d(lg, depth=d, height=h, width=w,
                                 return_heatmap=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    def test_bf16_logits(self, rng):
        logits = jnp.asarray(
            rng.standard_normal((1, 16, 16, 17 * 8)).astype(np.float32)
        ).astype(jnp.bfloat16)
        got = soft_argmax_3d_nhwc_pallas(logits, depth=8, interpret=True)
        want = soft_argmax_3d_nhwc(logits, depth=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2)
        g = jax.grad(lambda x: jnp.sum(
            soft_argmax_3d_nhwc_pallas(x, depth=8, interpret=True) ** 2
        ))(logits)
        assert g.dtype == jnp.bfloat16

    def test_pairs_strategy_odd_joints(self, rng):
        """The real-TPU tiling (2 joints / 128 lanes per cell + single-joint
        tail when J is odd), forced in interpret mode: fwd + bwd parity."""
        b, h, w, j, d = 2, 8, 8, 3, 64
        logits = jnp.asarray(
            rng.standard_normal((b, h, w, j * d)).astype(np.float32) * 2
        )
        got = soft_argmax_3d_nhwc_pallas(
            logits, num_joints=j, depth=d, interpret=True, strategy="pairs")
        want = soft_argmax_3d_nhwc(logits, num_joints=j, depth=d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

        tgt = jnp.asarray(rng.standard_normal((b, j * 3)).astype(np.float32))

        def f_pallas(x):
            c = soft_argmax_3d_nhwc_pallas(x, num_joints=j, depth=d,
                                           interpret=True, strategy="pairs")
            return jnp.sum((c - tgt) ** 2)

        def f_xla(x):
            c = soft_argmax_3d_nhwc(x, num_joints=j, depth=d)
            return jnp.sum((c - tgt) ** 2)

        g1 = jax.grad(f_pallas)(logits)
        g0 = jax.grad(f_xla)(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=5e-5)

    def test_pairs_strategy_even_joints(self, rng):
        b, h, w, j, d = 1, 8, 8, 4, 64
        logits = jnp.asarray(
            rng.standard_normal((b, h, w, j * d)).astype(np.float32)
        )
        got = soft_argmax_3d_nhwc_pallas(
            logits, num_joints=j, depth=d, interpret=True, strategy="pairs")
        want = soft_argmax_3d_nhwc(logits, num_joints=j, depth=d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
        g1 = jax.grad(lambda x: jnp.sum(soft_argmax_3d_nhwc_pallas(
            x, num_joints=j, depth=d, interpret=True, strategy="pairs") ** 2
        ))(logits)
        g0 = jax.grad(lambda x: jnp.sum(
            soft_argmax_3d_nhwc(x, num_joints=j, depth=d) ** 2))(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=5e-5)
