"""Fixture tests against the reference's REAL committed artifacts.

The reference ships genuine pipeline outputs; these tests load those exact
files (not fabrications) through this framework's IO layer:

- ``final_json_outputs/yuzu_black.mp4.json`` — 438 frames of the
  ``save_to_json`` schema (phase2_opp_mb/run.py:60-110);
- ``MB_npy/*.npy`` — MotionBERT (T,17,3) float32 interchange sequences
  (run.py:475-478);
- ``phase1_lifting/{mean,std}_train_{2d,3d}.npy`` — the f32-mean / f64-std
  normalization artifacts (H36_dataset.py:214-243 semantics).

Skip-guarded on the reference checkout being present.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")
JSON_DIR = REF / "phase2_opp_mb" / "final_json_outputs"
MB_DIR = REF / "phase2_opp_mb" / "MB_npy"
STATS_DIR = REF / "phase1_lifting"

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not present"
)


class TestVideoJsonSchema:
    def test_yuzu_black_loads_438_frames(self):
        from pose3d_tpu.pipeline.keypoints import load_video_json

        kp, conf, scores = load_video_json(JSON_DIR / "yuzu_black.mp4.json")
        assert kp.shape == (438, 17, 2)
        assert conf.shape == (438, 17)
        assert scores.shape == (438,)
        assert kp.dtype == np.float32
        # pixel coordinates of a real video: positive, bounded
        assert 0 <= kp.min() and kp.max() < 4000
        assert 0.0 <= conf.min() and conf.max() <= 1.0

    def test_reference_record_schema_matches_ours(self, tmp_path):
        """Our ``merge_detections`` output must be drop-in compatible with
        the reference's consolidated-JSON records: same keys, same nesting."""
        from pose3d_tpu.pipeline.keypoints import merge_detections

        with open(JSON_DIR / "yuzu_black.mp4.json") as fh:
            ref_records = json.load(fh)
        ref = ref_records[0]

        # one fake per-frame prediction file in the OpenPifPaf output layout
        frame = [{"keypoints": np.arange(51, dtype=float).tolist(),
                  "score": 0.9, "category_id": 1}]
        d = tmp_path / "preds"
        d.mkdir()
        (d / "0001.jpg.predictions.json").write_text(json.dumps(frame))
        ours = merge_detections(d)[0]

        assert set(ours.keys()) == set(ref.keys())
        assert ours["category_id"] == ref["category_id"] == 1
        assert np.asarray(ours["keypoints"]).shape == \
            np.asarray(ref["keypoints"]).shape == (17, 3)
        assert isinstance(ref["image_id"], str)
        assert isinstance(ours["image_id"], str)

    def test_all_committed_videos_load(self):
        from pose3d_tpu.pipeline.keypoints import load_video_json

        for f in sorted(JSON_DIR.glob("*.json")):
            kp, conf, scores = load_video_json(f)
            assert kp.ndim == 3 and kp.shape[1:] == (17, 2), f.name
            assert len(kp) > 0, f.name


class TestMotionBertNpy:
    def test_walking1_loads(self):
        from pose3d_tpu.pipeline.keypoints import load_mb_npy

        arr = load_mb_npy(MB_DIR / "Walking 1.mp4.npy")
        assert arr.shape == (696, 17, 3)
        assert arr.dtype == np.float32
        # root-relative metric-ish scale (MotionBERT convention)
        assert np.abs(arr).max() < 2.0

    def test_all_committed_sequences_load(self):
        from pose3d_tpu.pipeline.keypoints import load_mb_npy

        shapes = {}
        for f in sorted(MB_DIR.glob("*.npy")):
            arr = load_mb_npy(f)
            shapes[f.name] = arr.shape
        assert shapes["Walking 1.mp4.npy"] == (696, 17, 3)
        assert shapes["yuzu_black.mp4.npy"] == (438, 17, 3)
        assert shapes["trimmed_fps7.mp4.npy"] == (2713, 17, 3)
        assert shapes["yoga.mp4.npy"] == (392, 17, 3)

    def test_roundtrip_bit_exact(self, tmp_path):
        from pose3d_tpu.pipeline.keypoints import load_mb_npy, save_mb_npy

        arr = load_mb_npy(MB_DIR / "Walking 1.mp4.npy")
        save_mb_npy(arr, tmp_path / "out.npy")
        back = load_mb_npy(tmp_path / "out.npy")
        np.testing.assert_array_equal(back, arr)

    def test_json_npy_frame_counts_pair_up(self):
        """The committed 2D json and 3D npy for the same video must have the
        same frame count (the MotionBERT hand-off preserves T)."""
        from pose3d_tpu.pipeline.keypoints import load_mb_npy, load_video_json

        kp, _, _ = load_video_json(JSON_DIR / "yuzu_black.mp4.json")
        arr = load_mb_npy(MB_DIR / "yuzu_black.mp4.npy")
        assert len(kp) == len(arr) == 438

    def test_rotate_to_global_and_render(self, tmp_path):
        """Real MotionBERT output through the create_3d_mp4-equivalent path
        (rotate-to-global + render, run.py:305-352)."""
        from pose3d_tpu.pipeline.keypoints import load_mb_npy, rotate_to_global
        from pose3d_tpu.utils.visualize import render_3d_video

        arr = load_mb_npy(MB_DIR / "Walking 1.mp4.npy")[:3]
        rot = rotate_to_global(arr, subject="S1", camera=2)
        assert rot.shape == arr.shape
        # rotation preserves norms per frame/joint
        np.testing.assert_allclose(
            np.linalg.norm(rot, axis=-1), np.linalg.norm(arr, axis=-1),
            atol=1e-4,
        )
        out = tmp_path / "walking.mp4"
        render_3d_video(rot, out, fps=5.0, scale=2.8)
        assert out.exists() and out.stat().st_size > 0

    def test_rotation_matches_reference_inline_formula(self):
        """rotate_to_global vs a numpy oracle that spells out the reference's
        inline quaternion->R expansion verbatim (run.py:311-316) on the
        S1-cam2 extrinsics from core/cameras.py."""
        from pose3d_tpu.core.cameras import extrinsics
        from pose3d_tpu.pipeline.keypoints import load_mb_npy, rotate_to_global

        q, _ = extrinsics("S1", 2)
        q = np.asarray(q, dtype=np.float64)
        r_oracle = np.array([
            [1 - 2 * q[2] ** 2 - 2 * q[3] ** 2,
             2 * q[1] * q[2] - 2 * q[0] * q[3],
             2 * q[0] * q[2] + 2 * q[1] * q[3]],
            [2 * q[1] * q[2] + 2 * q[0] * q[3],
             1 - 2 * q[1] ** 2 - 2 * q[3] ** 2,
             2 * q[2] * q[3] - 2 * q[0] * q[1]],
            [2 * q[1] * q[3] - 2 * q[0] * q[2],
             2 * q[0] * q[1] + 2 * q[2] * q[3],
             1 - 2 * q[1] ** 2 - 2 * q[2] ** 2],
        ])
        arr = load_mb_npy(MB_DIR / "yuzu_black.mp4.npy")[:8]
        np.testing.assert_allclose(
            rotate_to_global(arr, subject="S1", camera=2),
            arr @ r_oracle.T, atol=1e-6)

    def test_render_3d_to_global_flag_applies_rotation(self, tmp_path):
        """render_3d_video(to_global=True) must equal pre-rotating by hand
        (the create_3d_mp4 display convention, run.py:336+343) — compared
        via identical mp4 bytes on the same input."""
        from pose3d_tpu.pipeline.keypoints import load_mb_npy, rotate_to_global
        from pose3d_tpu.utils.visualize import render_3d_video

        arr = load_mb_npy(MB_DIR / "yuzu_black.mp4.npy")[:2]
        a, b = tmp_path / "flag.mp4", tmp_path / "manual.mp4"
        render_3d_video(arr, a, fps=5.0, scale=2.8, to_global=True)
        render_3d_video(rotate_to_global(arr), b, fps=5.0, scale=2.8)
        assert a.read_bytes() == b.read_bytes()


class TestNormalizationArtifacts:
    """The committed stats npys pin the f32/f64 dtype contract that
    data/stats.py reproduces (H36_dataset.py:214-243)."""

    def test_dtypes_and_shapes(self):
        mean2d = np.load(STATS_DIR / "mean_train_2d.npy")
        std2d = np.load(STATS_DIR / "std_train_2d.npy")
        mean3d = np.load(STATS_DIR / "mean_train_3d.npy")
        std3d = np.load(STATS_DIR / "std_train_3d.npy")
        assert mean2d.shape == (17, 2) and mean2d.dtype == np.float32
        assert std2d.shape == (17, 2) and std2d.dtype == np.float64
        assert mean3d.shape == (17, 3) and mean3d.dtype == np.float32
        assert std3d.shape == (17, 3) and std3d.dtype == np.float64

    def test_compute_stats_reproduces_dtype_contract(self):
        from pose3d_tpu.data.stats import compute_stats

        data = np.random.default_rng(0).normal(
            size=(500, 17, 2)
        ).astype(np.float32)
        stats = compute_stats(data)
        ref_mean = np.load(STATS_DIR / "mean_train_2d.npy")
        ref_std = np.load(STATS_DIR / "std_train_2d.npy")
        assert stats.mean.dtype == ref_mean.dtype == np.float32
        assert stats.std.dtype == ref_std.dtype == np.float64
        assert stats.mean.shape == ref_mean.shape
        assert stats.std.shape == ref_std.shape

    def test_real_stats_standardize_roundtrip(self):
        """Load the REAL committed stats through load_stats and round-trip
        standardize/destandardize with them."""
        from pose3d_tpu.data.stats import (
            destandardize,
            load_stats,
            standardize,
        )

        stats = load_stats(STATS_DIR, dim=2)
        np.testing.assert_array_equal(
            stats.mean, np.load(STATS_DIR / "mean_train_2d.npy")
        )
        data = np.random.default_rng(1).normal(
            loc=500, scale=100, size=(64, 17, 2)
        ).astype(np.float32)
        z = standardize(data, stats)
        back = destandardize(z, stats)
        np.testing.assert_allclose(back, data, rtol=1e-5)

    def test_committed_stats_value_ranges(self):
        """What the committed artifacts actually record (useful provenance:
        they predate the zero_centre flag path — the 3D root mean is a
        camera-frame position ~(1.8, -0.9, 4.8) m, NOT zero, and the 2D means
        are normalized image coordinates in [0, 1])."""
        mean3d = np.load(STATS_DIR / "mean_train_3d.npy")
        mean2d = np.load(STATS_DIR / "mean_train_2d.npy")
        std3d = np.load(STATS_DIR / "std_train_3d.npy")
        assert np.linalg.norm(mean3d[0]) > 1.0  # root NOT zero-centred
        assert (std3d > 0).all()
        assert 0.0 < mean2d.min() and mean2d.max() < 1.0
