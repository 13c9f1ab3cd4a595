"""Unit tests for the L0/L1 geometry layer against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from pose3d_tpu.core import (
    cameras,
    coco_to_h36m,
    flip_pose,
    q_mult,
    quat_to_rotmat,
    qv_mult,
    world_to_camera,
    zero_centre,
)
from pose3d_tpu.core.skeleton import COCO_TO_H36M_MATRIX, FLIP_PERMUTATION


def _np_coco2h36m(x):
    """Independent oracle for the remap (semantics of run.py:15-58)."""
    y = np.zeros_like(x)
    y[0] = (x[11] + x[12]) * 0.5
    y[1], y[2], y[3] = x[12], x[14], x[16]
    y[4], y[5], y[6] = x[11], x[13], x[15]
    y[8] = (x[5] + x[6]) * 0.5
    y[7] = (y[0] + y[8]) * 0.5
    y[9] = x[0]
    y[10] = (x[1] + x[2]) * 0.5
    y[11], y[12], y[13] = x[5], x[7], x[9]
    y[14], y[15], y[16] = x[6], x[8], x[10]
    return y


class TestCocoToH36m:
    def test_matches_oracle(self, rng):
        x = rng.standard_normal((17, 2))
        np.testing.assert_allclose(coco_to_h36m(x), _np_coco2h36m(x), rtol=1e-12)

    def test_batched(self, rng):
        x = rng.standard_normal((5, 243, 17, 3)).astype(np.float32)
        got = coco_to_h36m(jnp.asarray(x))
        want = np.stack([[_np_coco2h36m(f) for f in clip] for clip in x])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matrix_rows_sum_to_one(self):
        np.testing.assert_allclose(COCO_TO_H36M_MATRIX.sum(axis=1), np.ones(17))


class TestQuaternion:
    def test_unit_rotation_preserves_norm(self, rng):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        v = rng.standard_normal((10, 3)).astype(np.float64)
        rotated = np.asarray(qv_mult(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(
            np.linalg.norm(rotated, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-6
        )

    def test_identity_quaternion(self, rng):
        v = rng.standard_normal((3,))
        out = qv_mult(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(v))
        np.testing.assert_allclose(out, v, atol=1e-7)

    def test_90deg_about_z(self):
        # q = (cos45, 0, 0, sin45) rotates x->y.
        s = np.sqrt(0.5)
        out = qv_mult(jnp.asarray([s, 0.0, 0.0, s]), jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-6)

    def test_qv_matches_rotmat(self, rng):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        v = rng.standard_normal((7, 3))
        via_q = np.asarray(qv_mult(jnp.asarray(q), jnp.asarray(v)))
        via_r = v @ np.asarray(quat_to_rotmat(jnp.asarray(q))).T
        np.testing.assert_allclose(via_q, via_r, atol=1e-6)

    def test_q_mult_associative(self, rng):
        a, b, c = (rng.standard_normal(4) for _ in range(3))
        ab_c = q_mult(q_mult(jnp.asarray(a), jnp.asarray(b)), jnp.asarray(c))
        a_bc = q_mult(jnp.asarray(a), q_mult(jnp.asarray(b), jnp.asarray(c)))
        np.testing.assert_allclose(ab_c, a_bc, atol=1e-6)


class TestFlip:
    def test_3d_involution(self, rng):
        pose = jnp.asarray(rng.standard_normal((4, 17, 3)).astype(np.float32))
        np.testing.assert_allclose(flip_pose(flip_pose(pose)), pose, atol=1e-6)

    def test_2d_involution(self, rng):
        pose = jnp.asarray(rng.random((4, 17, 2)).astype(np.float32))
        np.testing.assert_allclose(flip_pose(flip_pose(pose)), pose, atol=1e-6)

    def test_2d_x_mirrored_about_half(self, rng):
        pose = jnp.asarray(rng.random((17, 2)).astype(np.float32))
        flipped = flip_pose(pose)
        # joint 0 (root) is not in a swap pair
        np.testing.assert_allclose(flipped[0, 0], 1.0 - pose[0, 0], atol=1e-6)
        np.testing.assert_allclose(flipped[0, 1], pose[0, 1], atol=1e-6)

    def test_left_right_swap(self, rng):
        pose = jnp.asarray(rng.standard_normal((17, 3)).astype(np.float32))
        flipped = flip_pose(pose)
        # rhip (1) should carry lhip's (4) mirrored coords
        np.testing.assert_allclose(flipped[1, 0], -pose[4, 0], atol=1e-6)
        np.testing.assert_allclose(flipped[1, 1:], pose[4, 1:], atol=1e-6)

    def test_permutation_is_involution(self):
        perm = np.asarray(FLIP_PERMUTATION)
        np.testing.assert_array_equal(perm[perm], np.arange(17))


class TestCameras:
    def test_orientations_are_unit(self):
        norms = np.linalg.norm(cameras.ORIENTATION, axis=-1)
        np.testing.assert_allclose(norms, np.ones_like(norms), atol=1e-6)

    def test_world_to_camera_known_point(self):
        # A point at the camera position maps to the origin.
        q, t = cameras.extrinsics("S1", 0)
        out = world_to_camera(jnp.asarray(t / 1000.0), jnp.asarray(q), jnp.asarray(t))
        np.testing.assert_allclose(out, np.zeros(3), atol=1e-6)

    def test_world_to_camera_batched(self, rng):
        q, t = cameras.extrinsics("S5", 2)
        pts = rng.standard_normal((6, 17, 3))
        got = np.asarray(
            world_to_camera(jnp.asarray(pts), jnp.asarray(q), jnp.asarray(t))
        )
        # Oracle: rotate each point individually; f32 tolerance (translation
        # magnitudes are ~5 m, so ~1e-6 rounding is expected).
        for i in range(0, 6, 3):
            for j in range(0, 17, 5):
                want = np.asarray(
                    qv_mult(jnp.asarray(q), jnp.asarray(pts[i, j] - t / 1000.0))
                )
                np.testing.assert_allclose(got[i, j], want, atol=1e-5)


class TestZeroCentre:
    def test_root_is_zero(self, rng):
        pose = jnp.asarray(rng.standard_normal((8, 17, 3)).astype(np.float32))
        centred = zero_centre(pose)
        np.testing.assert_allclose(centred[:, 0], np.zeros((8, 3)), atol=1e-7)

    def test_relative_geometry_preserved(self, rng):
        pose = jnp.asarray(rng.standard_normal((17, 3)).astype(np.float32))
        centred = zero_centre(pose)
        np.testing.assert_allclose(
            centred[5] - centred[2], pose[5] - pose[2], atol=1e-6
        )
