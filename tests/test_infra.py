"""Infrastructure units: config CLI parsing, checkpointing, device feed."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.config import DirectConfig, LiftConfig, parse_config
from pose3d_tpu.data.feed import batch_iterator, prefetch_to_device
from pose3d_tpu.models.lifters import MartinezLifter
from pose3d_tpu.parallel.mesh import make_mesh
from pose3d_tpu.train import checkpoint as ckpt
from pose3d_tpu.train.state import create_train_state


class TestConfigCLI:
    def test_defaults(self):
        cfg = parse_config(LiftConfig, [])
        assert cfg.model == "vit" and cfg.n_epochs == 150
        assert cfg.data.action == "Posing"  # preset survives

    def test_overrides(self):
        cfg = parse_config(
            LiftConfig,
            ["--model", "martinez", "--lr", "0.001", "--flip", "1",
             "--data.action", "Walking", "--data.split_rate", "64",
             "--data.num_joints", "16"],
        )
        assert cfg.model == "martinez" and cfg.lr == 0.001 and cfg.flip
        assert cfg.data.action == "Walking"
        assert cfg.data.split_rate == 64 and cfg.data.num_joints == 16

    def test_direct_preset(self):
        cfg = parse_config(DirectConfig, ["--z_scale", "2.0",
                                          "--source", "video"])
        assert cfg.z_scale == 2.0 and cfg.source == "video"
        assert cfg.weight_decay is None  # resolved per source (see below)

    def test_weight_decay_resolves_per_reference_phase(self):
        # phase 3: Adam(weight_decay=1e-8) (train_3.py:31); phase 4: bare
        # Adam(lr) (phase4_joined/train.py:39). An explicit flag wins.
        from pose3d_tpu.cli.train_direct import _weight_decay

        assert _weight_decay(parse_config(DirectConfig, [])) == 1e-8
        assert _weight_decay(
            parse_config(DirectConfig, ["--source", "video"])) == 0.0
        assert _weight_decay(
            parse_config(DirectConfig, ["--weight_decay", "0.01"])) == 0.01


class TestCheckpoint:
    def _state(self, grad_clip=0.0):
        return create_train_state(
            MartinezLifter(), jax.random.key(0), jnp.zeros((4, 17, 2)),
            lr=1e-4, grad_clip=grad_clip,
        )

    def test_roundtrip(self, tmp_path):
        state = self._state()
        state = state.replace(step=jnp.asarray(7))
        ckpt.save(state, tmp_path, "run_a", batch_size=32,
                  extra={"model": "martinez"})
        fresh = self._state()
        restored, meta = ckpt.restore(fresh, tmp_path, "run_a")
        assert int(restored.step) == 7
        assert meta["batch_size"] == 32 and meta["model"] == "martinez"
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )

    def test_partial_restore_across_optimizers(self, tmp_path):
        """A checkpoint trained WITH grad clipping restores params into a
        state built WITHOUT it (different opt tree) via restore_params."""
        state = self._state(grad_clip=1.0)
        ckpt.save(state, tmp_path, "run_b", batch_size=8)
        template = self._state(grad_clip=0.0)
        params, bs = ckpt.restore_params(
            tmp_path, "run_b", template.params, template.batch_stats
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )

    def test_exists(self, tmp_path):
        assert not ckpt.exists(tmp_path, "nope")
        ckpt.save(self._state(), tmp_path, "yes")
        assert ckpt.exists(tmp_path, "yes")


class TestFeed:
    def test_epoch_coverage_and_shuffle(self, rng):
        x = np.arange(100, dtype=np.float32).reshape(100, 1)
        batches = list(batch_iterator((x,), 10, shuffle=True, seed=1, epochs=1))
        assert len(batches) == 10
        seen = np.sort(np.concatenate([b[0].ravel() for b in batches]))
        np.testing.assert_array_equal(seen, np.arange(100))
        # shuffled: first batch is not simply 0..9
        assert not np.array_equal(batches[0][0].ravel(), np.arange(10))

    def test_drop_remainder(self):
        x = np.zeros((105, 2), np.float32)
        batches = list(batch_iterator((x,), 10, shuffle=False, epochs=1))
        assert len(batches) == 10  # 105 -> 100

    def test_prefetch_preserves_order(self, devices):
        mesh = make_mesh()
        x = np.arange(64, dtype=np.float32).reshape(8, 8)[:, :1].repeat(8, 1)
        it = batch_iterator((np.arange(32, dtype=np.float32).reshape(32, 1),),
                            8, shuffle=False, epochs=1)
        out = [np.asarray(b[0]).ravel()[0] for b in prefetch_to_device(it, mesh)]
        assert out == [0.0, 8.0, 16.0, 24.0]


class TestRotateToGlobal:
    def test_norm_preserved(self, rng):
        from pose3d_tpu.pipeline.keypoints import rotate_to_global

        poses = rng.standard_normal((10, 17, 3)).astype(np.float32)
        out = rotate_to_global(poses, "S1", 2)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(poses, axis=-1),
            rtol=1e-5,
        )


class TestPredictArchInference:
    def test_temporal_checkpoint_arch_inferred(self, tmp_path):
        """cli.predict must reconstruct a NON-default TemporalLifter from
        the checkpoint's param shapes (regression: it used to build the
        default architecture and fail with ScopeParamShapeError)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pose3d_tpu.cli import predict
        from pose3d_tpu.models.temporal import TemporalLifter
        from pose3d_tpu.train import checkpoint as ckpt
        from pose3d_tpu.train.state import create_train_state

        model = TemporalLifter(clip_len=12, hidden=64, n_blocks=1, heads=2)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 12, 17, 2)), lr=1e-3)
        ckpt.save(state, tmp_path, "arch_test")

        kp = (np.random.default_rng(0).random((30, 17, 2)) * 900).astype(
            np.float32)
        np.save(tmp_path / "kp.npy", kp)
        predict.main([
            "--model", "temporal", "--heads", "2",
            "--checkpoint", "arch_test", "--log_dir", str(tmp_path),
            "--input", str(tmp_path / "kp.npy"),
            "--output", str(tmp_path / "out.npy"),
        ])
        out = np.load(tmp_path / "out.npy")
        assert out.shape == (30, 17, 3)
        assert np.isfinite(out).all()
