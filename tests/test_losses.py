"""Loss/metric conventions vs hand-computed oracles."""

import jax.numpy as jnp
import numpy as np

from pose3d_tpu import losses


class TestMPJPE:
    def test_per_joint_sum_over_batch(self, rng):
        pred = rng.standard_normal((6, 17, 3)).astype(np.float32)
        target = rng.standard_normal((6, 17, 3)).astype(np.float32)
        got = np.asarray(losses.loss_mpjpe(jnp.asarray(pred), jnp.asarray(target)))
        want = np.linalg.norm(pred - target, axis=-1).sum(axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-5)
        assert got.shape == (17,)

    def test_mm_convention(self):
        """1 cm error on every non-root joint => exactly 10 mm MPJPE.

        sums = 0.01*N per joint (root zero); /N, mean over 16, x17/16x1000
        = 0.01*17/16*1000 / (17/16)... verify the actual published formula:
        mean(sums[1:]/N) * (17/16) * 1000.
        """
        n = 50
        sums = np.full(17, 0.01 * n)
        sums[0] = 0.0
        got = float(losses.mpjpe_mm(jnp.asarray(sums), n))
        np.testing.assert_allclose(got, 0.01 * (17 / 16) * 1000, rtol=1e-6)

    def test_perfect_prediction_is_zero(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 17, 3)).astype(np.float32))
        assert float(losses.mpjpe_mm(losses.loss_mpjpe(x, x), 4)) == 0.0


class TestTriangle:
    def test_triangle_terms(self, rng):
        p2 = jnp.asarray(rng.random((4, 17, 2)).astype(np.float32))
        p3 = jnp.asarray(rng.random((4, 17, 3)).astype(np.float32))
        lift = jnp.asarray(rng.random((4, 17, 3)).astype(np.float32))
        g2 = jnp.asarray(rng.random((4, 17, 2)).astype(np.float32))
        g3 = jnp.asarray(rng.random((4, 17, 3)).astype(np.float32))
        total, terms = losses.triangle_loss(p2, p3, lift, g2, g3)
        want = (
            np.abs(p2 - g2).mean() + np.abs(p3 - g3).mean()
            + np.abs(lift - p3).mean()
        )
        np.testing.assert_allclose(float(total), want, rtol=1e-5)
        assert set(terms) == {"loss_2d", "loss_3d", "loss_lift"}

    def test_triangle_with_projection(self, rng):
        p2 = jnp.asarray(rng.random((4, 17, 2)).astype(np.float32))
        p3 = jnp.asarray(rng.random((4, 17, 3)).astype(np.float32))
        lift = jnp.asarray(rng.random((4, 17, 3)).astype(np.float32))
        proj = jnp.asarray(rng.random((4, 17, 2)).astype(np.float32))
        total, terms = losses.triangle_loss(p2, p3, lift, p2, p3, proj)
        assert "loss_proj" in terms
        # root-centring over the joint axis: shifting every joint of a sample
        # by a constant leaves the proj term unchanged
        shift = jnp.zeros_like(proj) + jnp.asarray([0.3, -0.2])
        total2, terms2 = losses.triangle_loss(p2, p3, lift, p2, p3, proj + shift)
        np.testing.assert_allclose(
            float(terms["loss_proj"]), float(terms2["loss_proj"]), rtol=1e-5
        )

    def test_triangle_sep_total(self, rng):
        args = [
            jnp.asarray(rng.random(s).astype(np.float32))
            for s in [(4, 17, 2), (4, 17, 3), (4, 17, 3), (4, 17, 3),
                      (4, 17, 2), (4, 17, 3)]
        ]
        total, terms = losses.triangle_loss_sep(*args)
        np.testing.assert_allclose(
            float(total), float(sum(terms.values())), rtol=1e-6
        )
        assert set(terms) == {"loss_2d", "loss_3d", "loss_domain_gap", "loss_lift"}
