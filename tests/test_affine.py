"""Affine/bbox geometry + 2D heatmap + flip family vs oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.core.affine import (
    affine_transform,
    bbox_to_center_scale,
    dpg_jitter,
    get_affine_transform,
    heatmap_uvd_to_image_coords,
    rot_aa,
    rotate_points_2d,
    transform_preds,
)
from pose3d_tpu.core.transforms import (
    flip_heatmap,
    flip_thetas,
    flip_twist,
    flip_xyz_joints,
)
from pose3d_tpu.ops.heatmap import (
    gaussian_heatmap_2d,
    hard_argmax_2d,
    norm_heatmap,
)

PAIRS_24 = ((1, 2), (4, 5), (7, 8), (10, 11), (13, 14), (16, 17),
            (18, 19), (20, 21), (22, 23))


class TestAffine:
    def test_identity_when_centered(self):
        """A crop of a (256-wide) box centred at (128,128) into 256^2 output
        is the identity."""
        t = get_affine_transform([128, 128], 256, 0, (256, 256))
        pts = np.array([[0.0, 0.0], [128, 128], [255, 17]])
        np.testing.assert_allclose(affine_transform(pts, t), pts, atol=1e-4)

    def test_inverse_roundtrip(self, rng):
        center = rng.uniform(100, 900, 2)
        scale = rng.uniform(100, 400, 2)
        rot = rng.uniform(-40, 40)
        t = get_affine_transform(center, scale, rot, (256, 256))
        t_inv = get_affine_transform(center, scale, rot, (256, 256), inv=True)
        pts = rng.uniform(0, 1000, (10, 2))
        back = affine_transform(affine_transform(pts, t), t_inv)
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_cv2_parity(self, rng):
        cv2 = pytest.importorskip("cv2")
        center = rng.uniform(100, 900, 2)
        scale = rng.uniform(100, 400, 2)
        for rot, inv in ((0, False), (30, False), (-15, True)):
            ours = get_affine_transform(center, scale, rot, (256, 192), inv=inv)
            # cv2 oracle via 3-point correspondence (the reference's method)
            from pose3d_tpu.core.affine import _rotate_2d, _third_point

            rad = np.pi * rot / 180
            src_dir = _rotate_2d([0, scale[0] * -0.5], rad)
            src = np.zeros((3, 2), np.float32)
            dst = np.zeros((3, 2), np.float32)
            src[0], src[1] = center, center + src_dir
            dst[0] = [128, 96]
            dst[1] = dst[0] + np.array([0, -128])
            src[2] = _third_point(src[0].astype(np.float64), src[1].astype(np.float64))
            dst[2] = _third_point(dst[0].astype(np.float64), dst[1].astype(np.float64))
            want = (cv2.getAffineTransform(np.float32(dst), np.float32(src))
                    if inv else cv2.getAffineTransform(np.float32(src), np.float32(dst)))
            np.testing.assert_allclose(ours, want, atol=1e-3)

    def test_transform_preds_recovers_pixel(self):
        """Heatmap coords map back into the bbox."""
        bbox = (100, 200, 356, 456)  # 256x256 box
        uvd = np.zeros((1, 17, 3))  # centre of the heatmap
        out = heatmap_uvd_to_image_coords(uvd, bbox)
        np.testing.assert_allclose(out[0, :, 0], 228.0, atol=0.5)  # centre x
        np.testing.assert_allclose(out[0, :, 1], 328.0, atol=0.5)

    def test_bbox_center_scale(self):
        c, s = bbox_to_center_scale((0, 0, 100, 50), aspect_ratio=1.0,
                                    scale_mult=1.0)
        np.testing.assert_allclose(c, [50, 25])
        np.testing.assert_allclose(s, [100, 100])  # square-corrected

    def test_dpg_jitter_in_bounds(self, rng):
        for _ in range(50):
            out = dpg_jitter((50, 60, 300, 400), 1000, 1000, rng)
            assert out[0] < out[2] and out[1] < out[3]

    def test_rotate_points(self):
        pts = np.array([[1.0, 0.0, 5.0]])
        out = rotate_points_2d(pts, 90.0)
        np.testing.assert_allclose(out, [[0.0, -1.0, 5.0]], atol=1e-7)

    def test_rot_aa_roundtrip(self, rng):
        aa = rng.normal(scale=0.5, size=3)
        out = rot_aa(rot_aa(aa, 30.0), -30.0)
        np.testing.assert_allclose(out, aa, atol=1e-4)


class TestHeatmap2D:
    def test_gaussian_peak_is_one(self):
        hm = np.asarray(gaussian_heatmap_2d(jnp.asarray([10.0, 20.0]),
                                            shape=(64, 64)))
        assert hm.shape == (64, 64)
        np.testing.assert_allclose(hm[20, 10], 1.0, atol=1e-6)
        assert hm[20, 18] == 0.0  # outside the 3-sigma window

    def test_norm_heatmap_variants(self, rng):
        hm = jnp.asarray(rng.standard_normal((2, 3, 8, 8)).astype(np.float32))
        sm = np.asarray(norm_heatmap("softmax", hm))
        np.testing.assert_allclose(sm.reshape(2, 3, -1).sum(-1), 1.0,
                                   atol=1e-5)
        sg = np.asarray(norm_heatmap("sigmoid", hm))
        assert (sg > 0).all() and (sg < 1).all()
        pos = jnp.abs(hm) + 0.1
        ds = np.asarray(norm_heatmap("divide_sum", pos))
        np.testing.assert_allclose(ds.reshape(2, 3, -1).sum(-1), 1.0,
                                   atol=1e-5)

    def test_hard_argmax(self, rng):
        hm = np.zeros((2, 3, 16, 16), np.float32)
        hm[0, 0, 5, 9] = 2.0
        hm[1, 2, 15, 0] = 1.0
        coords, maxvals = hard_argmax_2d(jnp.asarray(hm))
        np.testing.assert_array_equal(np.asarray(coords[0, 0]), [9, 5])
        np.testing.assert_array_equal(np.asarray(coords[1, 2]), [0, 15])
        np.testing.assert_allclose(np.asarray(maxvals[0, 0]), 2.0)


class TestFlipFamily:
    def test_flip_heatmap_involution(self, rng):
        hm = jnp.asarray(rng.random((2, 24, 8, 8)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(flip_heatmap(flip_heatmap(hm, PAIRS_24), PAIRS_24)),
            np.asarray(hm), atol=1e-6,
        )

    def test_flip_thetas_involution(self, rng):
        th = jnp.asarray(rng.standard_normal((24, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(flip_thetas(flip_thetas(th, PAIRS_24), PAIRS_24)),
            np.asarray(th), atol=1e-6,
        )

    def test_flip_twist_matches_reference_semantics(self, rng):
        phi = jnp.asarray(rng.standard_normal((23, 2)).astype(np.float32))
        out = np.asarray(flip_twist(phi, PAIRS_24))
        # cos passes through, sin negates, pairs swap (1-indexed joints)
        np.testing.assert_allclose(out[0], [float(phi[1, 0]),
                                            -float(phi[1, 1])], atol=1e-6)

    def test_flip_xyz(self, rng):
        xyz = jnp.asarray(rng.standard_normal((24, 3)).astype(np.float32))
        out = np.asarray(flip_xyz_joints(xyz, PAIRS_24))
        np.testing.assert_allclose(out[1, 0], -float(xyz[2, 0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 1:], np.asarray(xyz[0, 1:]), atol=1e-6)


class TestBoxCropFamily:
    """cv_cropBox/fix_cropBox variants (hybrik_utils.py:142-402)."""

    def _reference_box_points(self, bbox, output_size):
        """The reference's exact src/dst construction (test-local oracle,
        independent of box_crop_affine's implementation)."""
        xmin, ymin, xmax, ymax = [float(v) for v in bbox]
        xmax -= 1
        ymax -= 1
        res_h, res_w = output_size
        len_h = max(ymax - ymin, (xmax - xmin) * res_h / res_w)
        len_w = len_h * res_w / res_h
        pad = [(len_h - (ymax - ymin)) // 2, (len_w - (xmax - xmin)) // 2]

        def third(a, b):
            d = a - b
            return b + np.array([-d[1], d[0]], np.float32)

        src = np.zeros((3, 2), np.float32)
        dst = np.zeros((3, 2), np.float32)
        src[0] = [xmin - pad[1], ymin - pad[0]]
        src[1] = [xmax + pad[1], ymax + pad[0]]
        dst[1] = [res_w - 1, res_h - 1]
        src[2] = third(src[0], src[1])
        dst[2] = third(dst[0], dst[1])
        return src, dst

    def test_affine_matches_cv2_oracle(self):
        cv2 = pytest.importorskip("cv2")
        from pose3d_tpu.core.affine import box_crop_affine

        for bbox, out in [((12, 30, 200, 180), (64, 48)),
                          ((0, 0, 100, 300), (256, 256)),
                          ((5, 7, 50, 20), (32, 96))]:
            src, dst = self._reference_box_points(bbox, out)
            want = cv2.getAffineTransform(src, dst)
            got = box_crop_affine(bbox, out)
            np.testing.assert_allclose(got, want, atol=1e-4)
            want_inv = cv2.getAffineTransform(dst, src)
            got_inv = box_crop_affine(bbox, out, inv=True)
            np.testing.assert_allclose(got_inv, want_inv, atol=1e-4)

    def test_crop_box_zeroes_outside(self, rng):
        pytest.importorskip("cv2")
        from pose3d_tpu.core.affine import box_crop_affine, crop_box

        img = np.ones((120, 160, 3), np.float32)
        bbox = (40, 30, 100, 90)  # square box
        patch = crop_box(img, bbox, (64, 64))
        assert patch.shape == (64, 64, 3)
        # centre of the patch is inside the (all-ones) box
        np.testing.assert_allclose(patch[32, 32], 1.0, atol=1e-5)
        # a point far outside the box maps to zeroed source pixels: the
        # box is square so padding is tiny, and patch corners ~ box corners
        t_inv = box_crop_affine(bbox, (64, 64), inv=True)
        corner_src = t_inv[:, :2] @ np.array([0.0, 0.0]) + t_inv[:, 2]
        assert abs(corner_src[0] - 40) <= 2 and abs(corner_src[1] - 30) <= 2

    def test_crop_then_inverse_restores_interior(self, rng):
        pytest.importorskip("cv2")
        from pose3d_tpu.core.affine import crop_box, crop_box_inverse

        # smooth image so bilinear resampling round-trips accurately
        yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
        img = np.stack([xx / 160, yy / 120, (xx + yy) / 280], axis=-1)
        bbox = (40, 30, 104, 94)
        patch = crop_box(img, bbox, (128, 128))
        back = crop_box_inverse(patch, bbox, (120, 160), (128, 128))
        inner = (slice(40, 84), slice(50, 94))
        np.testing.assert_allclose(back[inner], img[inner], atol=0.02)

    def test_fix_box_matches_reference_semantics(self):
        from pose3d_tpu.core.affine import fix_box

        # tall box, square output -> width expands around the centre
        fixed = fix_box((50, 10, 70, 90), (64, 64))
        assert fixed == [20, 10, 100, 90]
        # wide box, square output -> height expands
        fixed = fix_box((10, 50, 90, 70), (64, 64))
        assert fixed == [10, 20, 90, 100]
        # already at ratio -> unchanged (ints)
        assert fix_box((0, 0, 64, 64), (64, 64)) == [0, 0, 64, 64]

    def test_fix_crop_box_returns_patch_and_box(self, rng):
        pytest.importorskip("cv2")
        from pose3d_tpu.core.affine import fix_crop_box

        img = rng.random((120, 160, 3)).astype(np.float32)
        patch, fixed = fix_crop_box(img, (50, 10, 70, 90), (64, 64))
        assert patch.shape == (64, 64, 3)
        assert fixed == [20, 10, 100, 90]

    def test_crop_box_rot_zero_centers_box(self, rng):
        pytest.importorskip("cv2")
        from pose3d_tpu.core.affine import crop_box_rot

        yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
        img = np.stack([xx, yy, xx * 0], axis=-1)
        bbox = (40, 30, 104, 94)
        patch = crop_box_rot(img, bbox, (64, 64), rot=0)
        # patch centre pixel samples the bbox centre ((40+103)/2, (30+93)/2)
        np.testing.assert_allclose(patch[31, 31, 0], (40 + 103) / 2, atol=1.5)
        np.testing.assert_allclose(patch[31, 31, 1], (30 + 93) / 2, atol=1.5)
