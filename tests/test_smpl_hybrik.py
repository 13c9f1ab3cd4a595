"""SMPL LBS + HybrIK IK: oracles, round-trips, differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.models import hybrik as ik
from pose3d_tpu.models import smpl


@pytest.fixture(scope="module")
def model():
    return smpl.synthetic_model(n_vertices=400, seed=0)


def _rest29(model, betas):
    v_shaped = jnp.asarray(model.v_template) + smpl.blend_shapes(
        betas, jnp.asarray(model.shapedirs)
    )
    rest24 = smpl.vertices2joints(jnp.asarray(model.j_regressor), v_shaped)
    leaf = v_shaped[:, list(model.leaf_vertex_ids)]
    return jnp.concatenate([rest24, leaf], axis=1)


def _fk29(rot24, rest29):
    rots = jnp.concatenate(
        [rot24, jnp.broadcast_to(jnp.eye(3), (rot24.shape[0], 5, 3, 3))], axis=1
    )
    pos, _ = smpl.batch_rigid_transform(
        rots, rest29, parents=smpl.PARENTS, levels=smpl.IK_LEVELS[1:]
    )
    return pos


class TestRodrigues:
    def test_90deg_z(self):
        v = jnp.asarray([[0.0, 0.0, np.pi / 2]])
        r = np.asarray(smpl.batch_rodrigues(v))[0]
        want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(r, want, atol=1e-6)

    def test_orthonormal(self, rng):
        v = jnp.asarray(rng.standard_normal((8, 3)).astype(np.float32))
        r = np.asarray(smpl.batch_rodrigues(v))
        np.testing.assert_allclose(
            r @ r.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (8, 3, 3)),
            atol=1e-5,
        )
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


class TestQuatRoundtrip:
    def test_rotmat_quat_rotmat(self, rng):
        v = jnp.asarray(rng.standard_normal((16, 3)).astype(np.float32))
        r = smpl.batch_rodrigues(v)
        q = smpl.rotmat_to_quat(r)
        r2 = smpl.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-4)


class TestRigidTransform:
    def test_matches_sequential_oracle(self, model, rng):
        """Level-batched FK == naive sequential FK."""
        b = 3
        rest = np.asarray(
            smpl.vertices2joints(
                jnp.asarray(model.j_regressor), jnp.asarray(model.v_template)[None]
            )
        ).repeat(b, 0)
        rots = np.asarray(
            smpl.batch_rodrigues(
                jnp.asarray(0.3 * rng.standard_normal((b, 24, 3)).astype(np.float32))
            )
        )
        pos, rel_tf = smpl.batch_rigid_transform(jnp.asarray(rots), jnp.asarray(rest))
        # oracle: sequential chain
        parents = smpl.PARENTS[:24]
        chain_r = np.zeros((b, 24, 3, 3))
        chain_t = np.zeros((b, 24, 3))
        chain_r[:, 0] = rots[:, 0]
        chain_t[:, 0] = rest[:, 0]
        for i in range(1, 24):
            p = parents[i]
            chain_r[:, i] = chain_r[:, p] @ rots[:, i]
            chain_t[:, i] = chain_t[:, p] + np.einsum(
                "bij,bj->bi", chain_r[:, p], rest[:, i] - rest[:, p]
            )
        np.testing.assert_allclose(np.asarray(pos), chain_t, atol=1e-4)
        # rel transform applied to the rest joint reproduces the posed joint
        homo = np.concatenate([rest, np.ones((b, 24, 1))], -1)
        posed = np.einsum("bjrc,bjc->bjr", np.asarray(rel_tf), homo)[..., :3]
        np.testing.assert_allclose(posed, chain_t, atol=1e-4)

    def test_identity_pose_keeps_rest(self, model):
        rest = smpl.vertices2joints(
            jnp.asarray(model.j_regressor), jnp.asarray(model.v_template)[None]
        )
        eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        pos, _ = smpl.batch_rigid_transform(eye, rest)
        np.testing.assert_allclose(np.asarray(pos), np.asarray(rest), atol=1e-6)


class TestLBS:
    def test_zero_pose_gives_shaped_vertices(self, model):
        betas = jnp.zeros((2, 10))
        pose = jnp.zeros((2, 72))
        verts, joints, rots, j_h36m = smpl.lbs(model, betas, pose)
        np.testing.assert_allclose(
            np.asarray(verts),
            np.broadcast_to(model.v_template, verts.shape), atol=1e-5,
        )
        assert j_h36m.shape == (2, 17, 3)

    def test_betas_move_vertices(self, model):
        pose = jnp.zeros((1, 72))
        v0, *_ = smpl.lbs(model, jnp.zeros((1, 10)), pose)
        v1, *_ = smpl.lbs(model, jnp.ones((1, 10)), pose)
        assert float(jnp.abs(v1 - v0).max()) > 1e-4

    def test_global_rotation_rotates_everything(self, model, rng):
        aa = np.zeros((1, 24, 3), np.float32)
        aa[0, 0] = [0, 0, np.pi / 2]
        verts, joints, _, _ = smpl.lbs(model, jnp.zeros((1, 10)),
                                       jnp.asarray(aa.reshape(1, 72)))
        r = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        rest = np.asarray(smpl.vertices2joints(
            jnp.asarray(model.j_regressor), jnp.asarray(model.v_template)[None]))
        # root-anchored rotation: j' = root + R (j - root)
        want = rest[:, :1] + (rest - rest[:, :1]) @ r.T
        np.testing.assert_allclose(np.asarray(joints), want, atol=1e-5)


class TestInverseKinematics:
    @staticmethod
    def _swing_only_rots(rng, rest29, b):
        """Local rotations with zero twist about each child bone axis:
        R_i = minimal rotation taking the rest bone to a random direction."""
        rots = [smpl.batch_rodrigues(
            jnp.asarray(0.3 * rng.standard_normal((b, 3)).astype(np.float32)))]
        for i in range(1, 24):
            c = int(smpl.CHILDREN[i])
            bone = rest29[:, c] - rest29[:, i]
            target_dir = bone + jnp.asarray(
                0.2 * rng.standard_normal((b, 3)).astype(np.float32)
            )
            rots.append(ik.rotmat_between(bone, target_dir))
        return jnp.stack(rots, axis=1)

    @staticmethod
    def _twist_phis(rot24, rest29):
        """Swing-twist decomposition: phi_i = twist of the local rotation
        about the rest bone axis of children[i] (quaternion projection)."""
        phis = []
        for i in range(1, 24):
            c = int(smpl.CHILDREN[i])
            axis = rest29[:, c] - rest29[:, i]
            axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
            q = smpl.rotmat_to_quat(rot24[:, i])
            d = jnp.sum(q[:, 1:] * axis, axis=-1)
            half = jnp.arctan2(d, q[:, 0])
            phis.append(jnp.stack([jnp.cos(2 * half), jnp.sin(2 * half)], -1))
        return jnp.stack(phis, axis=1)  # (B,23,2)

    @pytest.mark.parametrize("train", [False, True])
    @pytest.mark.slow
    def test_fk_ik_fk_roundtrip_swing_only(self, model, rng, train):
        """Positions generated by swing-only FK are reproduced after zero-
        twist IK + FK — the defining HybrIK property."""
        b = 2
        betas = jnp.asarray(rng.normal(scale=0.3, size=(b, 10)).astype(np.float32))
        rest29 = _rest29(model, betas)
        rots = self._swing_only_rots(rng, rest29, b)
        target29 = _fk29(rots, rest29)

        phis = jnp.concatenate(
            [jnp.ones((b, 23, 1)), jnp.zeros((b, 23, 1))], axis=-1
        )  # zero twist
        rot_est, _ = ik.inverse_kinematics(
            target29, phis, rest29, train=train
        )
        pos, _ = smpl.batch_rigid_transform(rot_est, rest29[:, :24])
        got = np.asarray(pos - pos[:, :1])
        want = np.asarray(target29[:, :24] - target29[:, :1])
        err = np.linalg.norm(got - want, axis=-1).max()
        assert err < 2e-3, f"train={train} max joint err {err}"

    @pytest.mark.parametrize("train", [False, True])
    def test_fk_ik_fk_roundtrip_with_twist(self, model, rng, train):
        """Full random rotations: feeding IK the true twist angles (swing-
        twist decomposition) reproduces the positions AND the rotations."""
        b = 2
        betas = jnp.zeros((b, 10))
        rest29 = _rest29(model, betas)
        aa = 0.25 * rng.standard_normal((b, 24, 3)).astype(np.float32)
        rots = smpl.batch_rodrigues(jnp.asarray(aa))
        target29 = _fk29(rots, rest29)
        phis = self._twist_phis(rots, rest29)

        rot_est, _ = ik.inverse_kinematics(target29, phis, rest29, train=train)
        pos, _ = smpl.batch_rigid_transform(rot_est, rest29[:, :24])
        got = np.asarray(pos - pos[:, :1])
        want = np.asarray(target29[:, :24] - target29[:, :1])
        err = np.linalg.norm(got - want, axis=-1).max()
        assert err < 2e-3, f"train={train} max joint err {err}"
        # local rotations recovered too (up to fp noise)
        np.testing.assert_allclose(
            np.asarray(rot_est), np.asarray(rots), atol=5e-3
        )

    def test_pelvis_pure_rotation_recovered(self, model, rng):
        """A rigid rotation of the whole rest skeleton must be absorbed
        entirely by the root rotation (identity locals elsewhere)."""
        betas = jnp.zeros((1, 10))
        rest29 = _rest29(model, betas)
        r = np.asarray(smpl.batch_rodrigues(
            jnp.asarray([[0.4, -0.2, 0.7]], jnp.float32)))[0]
        target = (np.asarray(rest29) - np.asarray(rest29)[:, :1]) @ r.T
        target = jnp.asarray(target + np.asarray(rest29)[:, :1])
        phis = jnp.concatenate(
            [jnp.ones((1, 23, 1)), jnp.zeros((1, 23, 1))], axis=-1
        )
        for train in (False, True):
            rot_est, _ = ik.inverse_kinematics(target, phis, rest29, train=train)
            np.testing.assert_allclose(np.asarray(rot_est[0, 0]), r, atol=1e-3)
            # non-root locals ~ identity
            np.testing.assert_allclose(
                np.asarray(rot_est[0, 1:]),
                np.broadcast_to(np.eye(3), (23, 3, 3)), atol=5e-3,
            )

    def test_twist_changes_rotations_not_positions(self, model, rng):
        b = 1
        betas = jnp.zeros((b, 10))
        rest29 = _rest29(model, betas)
        aa = 0.2 * rng.standard_normal((b, 24, 3)).astype(np.float32)
        target29 = _fk29(smpl.batch_rodrigues(jnp.asarray(aa)), rest29)
        phis0 = jnp.concatenate([jnp.ones((b, 23, 1)), jnp.zeros((b, 23, 1))], -1)
        ang = 0.5
        phis1 = jnp.concatenate(
            [jnp.full((b, 23, 1), np.cos(ang)), jnp.full((b, 23, 1), np.sin(ang))], -1
        )
        r0, _ = ik.inverse_kinematics(target29, phis0, rest29)
        r1, _ = ik.inverse_kinematics(target29, phis1, rest29)
        assert float(jnp.abs(r0 - r1).max()) > 1e-3  # rotations differ
        p0, _ = smpl.batch_rigid_transform(r0, rest29[:, :24])
        p1, _ = smpl.batch_rigid_transform(r1, rest29[:, :24])
        # ...but joint positions barely move (twist is about the bone axis);
        # the twist of a parent reorients grandchildren, so compare direct
        # children positions only through bone lengths
        d0 = np.linalg.norm(np.asarray(p0[:, 1:] - p0[:, smpl.PARENTS[1:24]]), axis=-1)
        d1 = np.linalg.norm(np.asarray(p1[:, 1:] - p1[:, smpl.PARENTS[1:24]]), axis=-1)
        np.testing.assert_allclose(d0, d1, atol=1e-5)


class TestHybrIKEndToEnd:
    def test_shapes_and_root_centre(self, model, rng):
        b = 2
        betas = jnp.asarray(rng.normal(scale=0.2, size=(b, 10)).astype(np.float32))
        rest29 = _rest29(model, betas)
        aa = 0.2 * rng.standard_normal((b, 24, 3)).astype(np.float32)
        target29 = _fk29(smpl.batch_rodrigues(jnp.asarray(aa)), rest29)
        phis = jnp.concatenate([jnp.ones((b, 23, 1)), jnp.zeros((b, 23, 1))], -1)
        verts, joints, rots, j17 = ik.hybrik(model, betas, target29, phis)
        assert verts.shape == (b, model.num_vertices, 3)
        assert joints.shape == (b, 24, 3) and rots.shape == (b, 24, 3, 3)
        assert j17.shape == (b, 17, 3)
        v, j, h = ik.root_centre_outputs(verts, joints, j17)
        np.testing.assert_allclose(np.asarray(j[:, 0]), 0.0, atol=1e-6)

    @pytest.mark.slow

    def test_jit_and_grad(self, model, rng):
        b = 2
        betas = jnp.asarray(rng.normal(scale=0.1, size=(b, 10)).astype(np.float32))
        rest29 = _rest29(model, betas)
        aa = 0.2 * rng.standard_normal((b, 24, 3)).astype(np.float32)
        target29 = _fk29(smpl.batch_rodrigues(jnp.asarray(aa)), rest29)
        phis = jnp.concatenate([jnp.ones((b, 23, 1)), jnp.zeros((b, 23, 1))], -1)

        @jax.jit
        def loss_fn(betas, skel, phis):
            # train=True: the reference backpropagates through the naive path
            _, _, _, j17 = ik.hybrik(model, betas, skel, phis, train=True)
            return jnp.mean(jnp.square(j17))

        g = jax.grad(loss_fn, argnums=(0, 1, 2))(betas, target29, phis)
        for gi in g:
            assert bool(jnp.all(jnp.isfinite(gi)))
        assert float(jnp.abs(g[0]).max()) > 0


class TestBones:
    def test_joints2bones_roundtrip(self, model, rng):
        rest = smpl.vertices2joints(
            jnp.asarray(model.j_regressor), jnp.asarray(model.v_template)[None]
        )
        rest = jnp.broadcast_to(rest, (3, 24, 3))
        dirs, lens = smpl.joints2bones(rest)
        back = smpl.bones2joints(dirs, lens)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rest),
                                   atol=1e-5)

    def test_bone_dirs_unit(self, model):
        rest = smpl.vertices2joints(
            jnp.asarray(model.j_regressor), jnp.asarray(model.v_template)[None]
        )
        dirs, lens = smpl.joints2bones(rest)
        norms = np.linalg.norm(np.asarray(dirs[:, 1:]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        assert float(lens[:, 1:].min()) > 0


class TestIKRobustness:
    def test_degenerate_all_zero_skeleton(self, model):
        """An all-zero predicted skeleton must not produce NaNs (epsilons in
        every normalization, identity fallback in the zero-mask SVD)."""
        betas = jnp.zeros((1, 10))
        rest29 = _rest29(model, betas)
        target = jnp.zeros_like(rest29)
        phis = jnp.concatenate([jnp.ones((1, 23, 1)), jnp.zeros((1, 23, 1))], -1)
        for train in (False, True):
            rots, _ = ik.inverse_kinematics(target, phis, rest29, train=train)
            assert bool(jnp.all(jnp.isfinite(rots))), f"train={train}"

    def test_extreme_twist_angles(self, model, rng):
        betas = jnp.zeros((1, 10))
        rest29 = _rest29(model, betas)
        aa = 0.2 * rng.standard_normal((1, 24, 3)).astype(np.float32)
        target = _fk29(smpl.batch_rodrigues(jnp.asarray(aa)), rest29)
        # phi = pi (cos=-1): full half-turn twists
        phis = jnp.concatenate([-jnp.ones((1, 23, 1)), jnp.zeros((1, 23, 1))], -1)
        rots, _ = ik.inverse_kinematics(target, phis, rest29)
        assert bool(jnp.all(jnp.isfinite(rots)))
        # rotations stay orthonormal
        rtr = np.asarray(rots @ jnp.swapaxes(rots, -1, -2))
        np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                                   atol=1e-3)

    def test_unnormalized_phis_are_normalized(self, model, rng):
        """The reference normalizes phis internally (lbs.py:612) — scaling
        them must not change the result."""
        betas = jnp.zeros((1, 10))
        rest29 = _rest29(model, betas)
        aa = 0.2 * rng.standard_normal((1, 24, 3)).astype(np.float32)
        target = _fk29(smpl.batch_rodrigues(jnp.asarray(aa)), rest29)
        phis = jnp.asarray(rng.standard_normal((1, 23, 2)).astype(np.float32))
        r1, _ = ik.inverse_kinematics(target, phis, rest29)
        r2, _ = ik.inverse_kinematics(target, phis * 7.3, rest29)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_eval_clamp_activates_on_outliers(self, model, rng):
        """Perturbing one joint far off its bone direction: the eval path's
        15mm clamp keeps the child bone near the observed relative bone."""
        betas = jnp.zeros((1, 10))
        rest29 = _rest29(model, betas)
        aa = 0.1 * rng.standard_normal((1, 24, 3)).astype(np.float32)
        target = _fk29(smpl.batch_rodrigues(jnp.asarray(aa)), rest29)
        # corrupt a mid-chain joint by 10 cm
        corrupted = target.at[0, 4].add(jnp.asarray([0.1, 0.0, 0.0]))
        phis = jnp.concatenate([jnp.ones((1, 23, 1)), jnp.zeros((1, 23, 1))], -1)
        rots, _ = ik.inverse_kinematics(corrupted, phis, rest29, train=False)
        assert bool(jnp.all(jnp.isfinite(rots)))
