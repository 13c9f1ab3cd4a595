"""Aux subsystems: debug hooks, metric logger, H36M batch detection tree."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.train.debug import StepTimer, assert_finite, nan_check_mode, profile
from pose3d_tpu.train.logging import MetricLogger


class TestDebug:
    def test_nan_check_raises(self):
        with nan_check_mode(True):
            with pytest.raises(Exception):
                jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
        # state restored
        assert not jax.config.jax_debug_nans

    def test_nan_check_disabled_passthrough(self):
        with nan_check_mode(False):
            out = jnp.log(jnp.asarray(-1.0))
            assert np.isnan(float(out))

    def test_assert_finite_jittable(self):
        @jax.jit
        def f(x):
            return assert_finite(x, "x") * 2

        np.testing.assert_allclose(np.asarray(f(jnp.ones(4))), 2.0)

    def test_profile_noop_without_dir(self):
        with profile(None):
            pass  # no trace requested: must be a no-op

    def test_profile_writes_trace(self, tmp_path):
        with profile(tmp_path):
            jnp.ones(8).block_until_ready()
        assert list(tmp_path.rglob("*.xplane.pb"))

    def test_step_timer(self):
        t = StepTimer(window=2)
        x = jnp.ones(4)
        assert t.tick(x) is None  # priming
        assert t.tick(x, batch_size=8) is None
        stats = t.tick(x, batch_size=8)
        assert stats and stats["steps_per_s"] > 0


class TestMetricLogger:
    def test_jsonl_records(self, tmp_path):
        logger = MetricLogger(tmp_path, "runx", config={"learning_rate": 1e-4})
        logger.log_epoch(0, 3, 0.5, 100.0, 0.4, 90.0, lr=1e-4)
        logger.log_epoch(1, 3, 0.3, 80.0, 0.35, 85.0, lr=1e-4)
        logger.finish()
        lines = [json.loads(l) for l in
                 (tmp_path / "runs" / "runx.jsonl").read_text().splitlines()]
        assert lines[0]["event"] == "config"
        assert lines[1]["epoch"] == 1 and lines[1]["train_mpjpe"] == 100.0
        assert lines[-1]["event"] == "finish"
        assert "_runtime" in lines[-1]

    def test_extra_keys_ride_along(self, tmp_path):
        logger = MetricLogger(tmp_path, "runy")
        logger.log_epoch(0, 1, 0.1, 1.0, 0.1, 1.0, loss_lift=0.02)
        rec = json.loads(
            (tmp_path / "runs" / "runy.jsonl").read_text().splitlines()[0]
        )
        assert rec["loss_lift"] == 0.02


class TestH36MBatchTree:
    def test_walks_subject_actions(self, tmp_path, rng):
        import cv2

        from pose3d_tpu.pipeline.detector import MockDetector
        from pose3d_tpu.pipeline.h36m_batch import detect_h36m_tree

        # fabricate <root>/videos/S1/outputVideos/{act1,act2}/000N.jpg
        for act in ("Walking 1.12345.mp4", "Posing.12345.mp4"):
            d = tmp_path / "videos" / "S1" / "outputVideos" / act
            d.mkdir(parents=True)
            for i in range(3):
                img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i+1:04d}.jpg"), img)
        out = tmp_path / "out"
        written = detect_h36m_tree(tmp_path, out, MockDetector(), subjects=("S1",))
        assert len(written) == 2
        for path in written:
            records = json.loads(path.read_text())
            assert len(records) == 3
            assert np.asarray(records[0]["keypoints"]).shape == (17, 3)

    def test_missing_subject_skipped(self, tmp_path):
        from pose3d_tpu.pipeline.detector import MockDetector
        from pose3d_tpu.pipeline.h36m_batch import detect_h36m_tree

        written = detect_h36m_tree(tmp_path, tmp_path / "o", MockDetector(),
                                   subjects=("S9",))
        assert written == []
