"""Fused Martinez inference kernel: parity with the flax eval path."""

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.models.lifters import MartinezLifter
from pose3d_tpu.ops.pallas_martinez import (
    build_fused_params,
    fused_residual_block,
    martinez_infer_fused,
)


def _trained_variables():
    model = MartinezLifter()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((8, 17, 2)), train=True,
    )
    return model, variables


class TestFusedMartinez:
    def test_exact_parity_with_flax_eval(self, rng):
        model, variables = _trained_variables()
        x = jnp.asarray(rng.standard_normal((256, 17, 2)).astype(np.float32))
        want = model.apply(variables, x, train=False)
        fused = build_fused_params(
            variables["params"], variables["batch_stats"],
            compute_dtype=jnp.float32,
        )
        got = martinez_infer_fused(fused, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_block_kernel_matches_reference_math(self, rng):
        f = 256
        x = jnp.asarray(rng.standard_normal((64, f)).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((f, f)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng.standard_normal((f, f)).astype(np.float32) * 0.05)
        s1 = jnp.asarray(rng.random(f).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal(f).astype(np.float32))
        s2 = jnp.asarray(rng.random(f).astype(np.float32))
        b2 = jnp.asarray(rng.standard_normal(f).astype(np.float32))
        got = fused_residual_block(x, w1, s1, b1, w2, s2, b2, interpret=True)
        h = np.maximum(np.asarray(x @ w1) * np.asarray(s1) + np.asarray(b1), 0)
        y = np.maximum(h @ np.asarray(w2) * np.asarray(s2) + np.asarray(b2), 0)
        want = np.asarray(x) + y
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_uneven_batch_tile_fallback(self, rng):
        """Batch not divisible by the tile: the tile halves until it fits."""
        model, variables = _trained_variables()
        x = jnp.asarray(rng.standard_normal((96, 17, 2)).astype(np.float32))
        fused = build_fused_params(
            variables["params"], variables["batch_stats"],
            compute_dtype=jnp.float32,
        )
        got = martinez_infer_fused(fused, x, interpret=True)
        want = model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
