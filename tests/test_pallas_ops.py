"""Pallas kernels vs XLA references (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.ops.heatmap import soft_argmax_3d
from pose3d_tpu.ops.pallas_softargmax import soft_argmax_3d_pallas


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
