"""Gaussian heatmap synthesis + soft-argmax: oracle parity and round-trips."""

import math

import jax.numpy as jnp
import numpy as np

from pose3d_tpu.ops.heatmap import (
    gaussian_heatmap_3d,
    heatmap_targets,
    soft_argmax_2d,
    soft_argmax_3d,
    uvw_to_xyz,
    xyz_to_uvw,
)


def _reference_heatmap(keypoint, sigma=0.5):
    """Independent oracle restating H36_dataset._keypoint_to_heatmap_3D
    semantics (windowed Gaussian placed into a 64^3 volume)."""
    im = np.zeros((64, 64, 64), dtype=np.float32)
    k = 31.5 * (1 + keypoint)
    ki = np.rint(k).astype(int)
    size = int(math.ceil(6 * sigma))
    if size % 2 == 0:
        size += 1
    half = size // 2
    u = np.arange(ki[0] - half, ki[0] + half + 1)
    v = np.arange(ki[1] - half, ki[1] + half + 1)
    w = np.arange(ki[2] - half, ki[2] + half + 1)
    uu, vv, ww = np.meshgrid(u, v, w, indexing="ij", sparse=True)
    z = np.exp(-((uu - k[0]) ** 2 + (vv - k[1]) ** 2 + (ww - k[2]) ** 2)
               / (2 * sigma ** 2))
    tu, tv, tw = max(0, ki[0] - half), max(0, ki[1] - half), max(0, ki[2] - half)
    bu, bv, bw = min(64, ki[0] + half + 1), min(64, ki[1] + half + 1), min(64, ki[2] + half + 1)
    im[tu:bu, tv:bv, tw:bw] = z[
        tu - (ki[0] - half): tu - (ki[0] - half) + (bu - tu),
        tv - (ki[1] - half): tv - (ki[1] - half) + (bv - tv),
        tw - (ki[2] - half): tw - (ki[2] - half) + (bw - tw),
    ]
    return im


class TestGaussianHeatmap:
    def test_matches_reference_oracle(self, rng):
        for _ in range(5):
            kp = rng.uniform(-0.95, 0.95, 3).astype(np.float32)
            got = np.asarray(gaussian_heatmap_3d(jnp.asarray(kp)))
            want = _reference_heatmap(kp)
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_boundary_keypoint(self):
        """Keypoints at +-1 land on the grid edge; window is clipped."""
        for kp in ([1.0, 1.0, 1.0], [-1.0, -1.0, -1.0], [1.0, -1.0, 0.0]):
            kp = np.asarray(kp, np.float32)
            got = np.asarray(gaussian_heatmap_3d(jnp.asarray(kp)))
            want = _reference_heatmap(kp)
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_batched_targets_shape(self, rng):
        kp = jnp.asarray(rng.uniform(-0.9, 0.9, (4, 17, 3)).astype(np.float32))
        hm = heatmap_targets(kp)
        assert hm.shape == (4, 17, 64, 64, 64)

    def test_axis_remap_roundtrip(self, rng):
        kp = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
        np.testing.assert_allclose(uvw_to_xyz(xyz_to_uvw(kp)), kp, atol=1e-7)

    def test_peak_at_keypoint(self):
        kp = np.asarray([0.25, -0.5, 0.75], np.float32)
        hm = np.asarray(gaussian_heatmap_3d(jnp.asarray(kp)))
        peak = np.unravel_index(hm.argmax(), hm.shape)
        k = 31.5 * (1 + kp)
        np.testing.assert_array_equal(peak, np.rint(k))


class TestSoftArgmax3D:
    def test_recovers_sharp_peak(self, rng):
        """Logits with a sharp peak at voxel (d,h,w) decode to that voxel's
        normalized coordinate (x from w, y from h, z from d)."""
        b, j = 2, 17
        logits = np.zeros((b, j, 64, 64, 64), np.float32)
        targets = rng.integers(4, 60, size=(b, j, 3))
        for bi in range(b):
            for ji in range(j):
                d, h, w = targets[bi, ji]
                logits[bi, ji, d, h, w] = 50.0
        coords, hm = soft_argmax_3d(jnp.asarray(logits))
        coords = np.asarray(coords).reshape(b, j, 3)
        want_x = (targets[..., 2] / 64 - 0.5) * 2
        want_y = (targets[..., 1] / 64 - 0.5) * 2
        want_z = (targets[..., 0] / 64 - 0.5) * 2.5
        np.testing.assert_allclose(coords[..., 0], want_x, atol=1e-4)
        np.testing.assert_allclose(coords[..., 1], want_y, atol=1e-4)
        np.testing.assert_allclose(coords[..., 2], want_z, atol=1e-4)
        np.testing.assert_allclose(np.asarray(hm).sum((2, 3, 4)), 1.0, atol=1e-5)

    def test_gaussian_roundtrip(self, rng):
        """heatmap_targets -> log -> soft_argmax recovers the keypoint (in
        uvw storage order) to sub-voxel accuracy."""
        kp = rng.uniform(-0.8, 0.8, (2, 17, 3)).astype(np.float32)
        hm = heatmap_targets(jnp.asarray(kp))  # (B,J,64,64,64), uvw order
        logits = jnp.log(hm + 1e-12) * 1.0
        coords, _ = soft_argmax_3d(logits, z_scale=2.0, return_heatmap=False)
        coords = np.asarray(coords).reshape(2, 17, 3)
        uvw = np.asarray(xyz_to_uvw(jnp.asarray(kp)))
        # peak voxel k = 31.5*(1+u) => coord = (k/64 - .5)*2 = u*63/64 - 1/64
        # decode: x ~ axis4(w)=uvw[2], y ~ axis3(v)=uvw[1], z ~ axis2(u)=uvw[0]
        np.testing.assert_allclose(coords[..., 0], uvw[..., 2] * 63 / 64 - 1 / 64, atol=0.04)
        np.testing.assert_allclose(coords[..., 1], uvw[..., 1] * 63 / 64 - 1 / 64, atol=0.04)
        np.testing.assert_allclose(coords[..., 2], uvw[..., 0] * 63 / 64 - 1 / 64, atol=0.04)

    def test_z_scale_config(self):
        logits = jnp.zeros((1, 17, 64, 64, 64))
        c25, _ = soft_argmax_3d(logits, z_scale=2.5, return_heatmap=False)
        c20, _ = soft_argmax_3d(logits, z_scale=2.0, return_heatmap=False)
        c25 = np.asarray(c25).reshape(17, 3)
        c20 = np.asarray(c20).reshape(17, 3)
        # uniform distribution: E = 31.5 -> (31.5/64 - .5) * scale
        np.testing.assert_allclose(c25[:, 2], (31.5 / 64 - 0.5) * 2.5, atol=1e-5)
        np.testing.assert_allclose(c20[:, 2], (31.5 / 64 - 0.5) * 2.0, atol=1e-5)


class TestSoftArgmax2D:
    def test_recovers_peak_in_unit_coords(self, rng):
        logits = np.zeros((2, 17, 64, 64), np.float32)
        targets = rng.integers(0, 64, size=(2, 17, 2))  # (h, w)
        for bi in range(2):
            for ji in range(17):
                h, w = targets[bi, ji]
                logits[bi, ji, h, w] = 50.0
        coords = np.asarray(soft_argmax_2d(jnp.asarray(logits))).reshape(2, 17, 2)
        np.testing.assert_allclose(coords[..., 0], targets[..., 1] / 64, atol=1e-4)
        np.testing.assert_allclose(coords[..., 1], targets[..., 0] / 64, atol=1e-4)
        assert coords.min() >= 0 and coords.max() <= 1


class TestSoftArgmaxNHWC:
    def test_matches_jdhw_layout(self, rng):
        """NHWC fast path == canonical (J,D,H,W) decode."""
        b, h, w, j, d = 2, 16, 16, 17, 8
        nhwc = jnp.asarray(
            rng.standard_normal((b, h, w, j * d)).astype(np.float32) * 2
        )
        from pose3d_tpu.ops.heatmap import soft_argmax_3d_nhwc

        got = soft_argmax_3d_nhwc(nhwc, j, d, z_scale=2.5)
        jdhw = nhwc.reshape(b, h, w, j, d).transpose(0, 3, 4, 1, 2)
        want, _ = soft_argmax_3d(jdhw, j, d, h, w, z_scale=2.5,
                                 return_heatmap=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
