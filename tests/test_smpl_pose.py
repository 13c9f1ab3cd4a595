"""Full SMPL-IK pose model: shapes, back-projection oracle, flip machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.models import smpl
from pose3d_tpu.models.smpl_pose import (
    HybrIKPose,
    PoseSMPLNet,
    flip_phi,
    flip_uvd_coord,
    uvd_to_cam,
)


@pytest.fixture(scope="module")
def assembly():
    net = PoseSMPLNet(architecture="resnet18", depth=8)
    return HybrIKPose(net=net, smpl=smpl.synthetic_model(300, seed=1))


def _cam_args(b):
    trans_inv = jnp.broadcast_to(
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (b, 2, 3)
    )
    # inverse intrinsics: 1/f on the pixel rows, last row (0,0,1)
    k_inv = jnp.broadcast_to(
        jnp.diag(jnp.asarray([1e-3, 1e-3, 1.0])), (b, 3, 3)
    )
    joint_root = jnp.tile(jnp.asarray([[0.0, 0.0, 3000.0]]), (b, 1))
    depth_factor = jnp.full((b, 1), 2200.0)
    return trans_inv, k_inv, joint_root, depth_factor


class TestUvdToCam:
    def test_root_at_centre_maps_to_origin(self):
        """A joint at uvd (0,0,0) with identity transforms sits on the ray
        through pixel (128,128); with root-relative output and K^-1 centred
        there, it lands at ~0 after root subtraction of itself."""
        b = 1
        uvd = jnp.zeros((b, 29, 3))
        xyz = uvd_to_cam(uvd, *_cam_args(b), heatmap_size=64)
        # all joints identical => root-relative all zero
        np.testing.assert_allclose(np.asarray(xyz - xyz[:, :1]), 0.0, atol=1e-6)

    def test_depth_direction(self):
        b = 1
        uvd = jnp.zeros((b, 2, 3)).at[0, 1, 2].set(0.5)  # second joint deeper
        trans_inv, k_inv, joint_root, depth_factor = _cam_args(b)
        xyz = uvd_to_cam(uvd, trans_inv, k_inv, joint_root, depth_factor,
                         heatmap_size=64, return_relative=False)
        # z = (dz + root_z)/depth_factor
        np.testing.assert_allclose(
            float(xyz[0, 0, 2]), 3000.0 / 2200.0, rtol=1e-5
        )
        np.testing.assert_allclose(
            float(xyz[0, 1, 2]), (0.5 * 2200 + 3000) / 2200.0, rtol=1e-5
        )

    def test_matches_reference_formula(self, rng):
        """Independent numpy restatement of :146-184."""
        b, k = 2, 29
        uvd = rng.uniform(-0.5, 0.5, (b, k, 3)).astype(np.float32)
        trans_inv = rng.standard_normal((b, 2, 3)).astype(np.float32)
        k_inv = rng.standard_normal((b, 3, 3)).astype(np.float32) * 0.001
        joint_root = rng.uniform(-100, 100, (b, 3)).astype(np.float32)
        joint_root[:, 2] += 3000
        depth_factor = np.full((b, 1), 2200.0, np.float32)

        got = np.asarray(uvd_to_cam(
            jnp.asarray(uvd), jnp.asarray(trans_inv), jnp.asarray(k_inv),
            jnp.asarray(joint_root), jnp.asarray(depth_factor), heatmap_size=64,
        ))
        want = np.zeros_like(got)
        for bi in range(b):
            for ki in range(k):
                u = (uvd[bi, ki, 0] + 0.5) * 64 * 4
                v = (uvd[bi, ki, 1] + 0.5) * 64 * 4
                dz = uvd[bi, ki, 2] * depth_factor[bi, 0]
                uv = trans_inv[bi] @ np.array([u, v, 1.0])
                xyz = k_inv[bi] @ np.array([uv[0], uv[1], 1.0])
                xyz = xyz * (dz + joint_root[bi, 2])
                want[bi, ki] = (xyz - joint_root[bi]) / depth_factor[bi, 0]
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestFlip:
    def test_flip_uvd_involution(self, rng):
        uvd = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 29, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(flip_uvd_coord(flip_uvd_coord(uvd))), np.asarray(uvd),
            atol=1e-6,
        )

    def test_flip_phi_involution(self, rng):
        phi = jnp.asarray(rng.standard_normal((2, 23, 2)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(flip_phi(flip_phi(phi))), np.asarray(phi), atol=1e-6
        )

    def test_flip_swaps_left_right(self, rng):
        uvd = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 29, 3)).astype(np.float32))
        f = flip_uvd_coord(uvd)
        # left hip (1) <- right hip (2) mirrored
        np.testing.assert_allclose(float(f[0, 1, 0]), -float(uvd[0, 2, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(f[0, 1, 1:]), np.asarray(uvd[0, 2, 1:]), atol=1e-6)


class TestHybrIKPoseEndToEnd:
    @pytest.mark.slow
    def test_forward_shapes(self, assembly):
        b = 2
        x = jnp.zeros((b, 64, 64, 3))
        variables = assembly.init(jax.random.key(0), x)
        out = assembly.apply(variables, x, *_cam_args(b))
        assert out["pred_xyz_jts_17"].shape == (b, 51)
        assert out["pred_xyz_jts_24"].shape == (b, 72)
        assert out["pred_xyz_jts_24_struct"].shape == (b, 72)
        assert out["pred_vertices"].shape == (b, 300, 3)
        assert out["pred_theta_quats"].shape == (b, 96)
        assert out["pred_uvd_jts"].shape == (b, 87)
        for v in out.values():
            assert bool(jnp.all(jnp.isfinite(v))), "non-finite output"

    @pytest.mark.slow

    def test_flip_ensemble_runs(self, assembly):
        b = 1
        x = jnp.ones((b, 64, 64, 3)) * 0.5
        variables = assembly.init(jax.random.key(0), x)
        out = assembly.apply(variables, x, *_cam_args(b), flip_test=True)
        assert bool(jnp.all(jnp.isfinite(out["pred_xyz_jts_17"])))

    def test_jit_compiles(self, assembly):
        b = 1
        x = jnp.zeros((b, 64, 64, 3))
        variables = assembly.init(jax.random.key(0), x)

        @jax.jit
        def fwd(v, img, ti, kinv, root, df):
            return assembly.apply(v, img, ti, kinv, root, df)["pred_xyz_jts_17"]

        out = fwd(variables, x, *_cam_args(b))
        assert out.shape == (b, 51)


class TestHybrIKTraining:
    @pytest.mark.slow
    def test_train_step_reduces_loss(self, assembly, rng):
        import optax

        from pose3d_tpu.train.smpl_steps import make_hybrik_train_step
        from pose3d_tpu.train.state import TrainState, make_optimizer
        from pose3d_tpu.train.schedule import plateau_init

        b = 4
        frames = jnp.asarray(rng.random((b, 64, 64, 3)).astype(np.float32))
        cam = _cam_args(b)
        uvd_gt = jnp.asarray(
            rng.uniform(-0.4, 0.4, (b, 29, 3)).astype(np.float32))
        xyz_gt = jnp.asarray(
            rng.uniform(-0.3, 0.3, (b, 17, 3)).astype(np.float32))

        variables = assembly.init(jax.random.key(0), frames)
        tx = make_optimizer(3e-4, "adam")
        state = TrainState(
            step=jnp.asarray(0), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            plateau=plateau_init(3e-4), tx=tx, apply_fn=None,
        )
        step = make_hybrik_train_step(assembly, donate=False)
        losses_seen = []
        for i in range(16):
            # fixed dropout key: isolates optimization progress from noise
            state, m = step(state, frames, cam, uvd_gt, xyz_gt,
                            jax.random.key(7))
            losses_seen.append(float(m["loss"]))
            assert np.isfinite(losses_seen[-1])
        assert np.mean(losses_seen[-4:]) < np.mean(losses_seen[:4]), losses_seen
