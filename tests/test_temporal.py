"""Temporal sequence lifter: shapes, temporal mixing, training integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.data import synthetic
from pose3d_tpu.models.temporal import TemporalLifter, make_clips
from pose3d_tpu.train.state import create_train_state
from pose3d_tpu.train.steps import make_lifter_train_step


def _small_model(clip_len=16):
    return TemporalLifter(clip_len=clip_len, hidden=64, n_blocks=2, heads=4)


class TestTemporalLifter:
    def test_output_shape(self):
        model = _small_model()
        x = jnp.zeros((2, 16, 17, 2))
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert out.shape == (2, 16, 17, 3)

    def test_shorter_clip_ok(self):
        """Clips shorter than clip_len reuse the leading temporal PE."""
        model = _small_model(clip_len=16)
        x = jnp.zeros((1, 9, 17, 2))
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        assert model.apply(v, x, train=False).shape == (1, 9, 17, 3)

    def test_temporal_mixing(self, rng):
        """Perturbing frame 0 must change predictions at other frames —
        the defining property vs the per-frame lifter."""
        model = _small_model()
        x = jnp.asarray(rng.random((1, 16, 17, 2)).astype(np.float32))
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        x2 = x.at[0, 0].add(1.0)
        out2 = model.apply(v, x2, train=False)
        diff_other_frames = float(jnp.abs(out2[:, 1:] - out[:, 1:]).max())
        assert diff_other_frames > 1e-4

    def test_spatial_mixing(self, rng):
        model = _small_model()
        x = jnp.asarray(rng.random((1, 16, 17, 2)).astype(np.float32))
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        x2 = x.at[0, 5, 3].add(1.0)  # frame 5, joint 3
        out2 = model.apply(v, x2, train=False)
        # other joints of frame 5 change
        assert float(jnp.abs(out2[0, 5, :3] - out[0, 5, :3]).max()) > 1e-4

    @pytest.mark.slow

    def test_trains_with_generic_step(self):
        """The generic lifter train step handles (B,T,J,D) clips too."""
        model = _small_model()
        kp2d, kp3d = synthetic.synthetic_h36m(256)
        kp3d = kp3d - kp3d[:, :1]
        c2 = jnp.asarray(make_clips(kp2d, 16))  # (16,16,17,2)
        c3 = jnp.asarray(make_clips(kp3d, 16))
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((4, 16, 17, 2)), lr=1e-3
        )
        step = make_lifter_train_step(donate=False)
        losses = []
        for i in range(25):
            state, m = step(state, c2[:8], c3[:8], jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.5, losses[::6]


class TestMakeClips:
    def test_nonoverlapping(self, rng):
        seq = rng.random((100, 17, 2)).astype(np.float32)
        clips = make_clips(seq, 25)
        assert clips.shape == (4, 25, 17, 2)  # starts 0,25,50,75
        np.testing.assert_array_equal(clips[3], seq[75:100])

    def test_tail_padding(self, rng):
        seq = rng.random((10, 17, 3)).astype(np.float32)
        clips = make_clips(seq, 16)
        assert clips.shape == (1, 16, 17, 3)
        np.testing.assert_array_equal(clips[0, 9:], np.repeat(seq[-1:], 7, 0))

    def test_overlapping_stride(self, rng):
        seq = rng.random((50, 17, 2)).astype(np.float32)
        clips = make_clips(seq, 20, stride=10)
        assert clips.shape[0] == 4  # starts 0,10,20,30

    def test_every_frame_covered(self, rng):
        """Regression: 438 frames / clip 243 / stride 121 used to leave
        frames 364..437 in no clip (the stride grid stops at 121); a final
        window must anchor at n - clip_len."""
        from pose3d_tpu.models.temporal import clip_starts

        starts = clip_starts(438, 243, 121)
        assert starts == [0, 121, 195]
        covered = np.zeros(438, bool)
        for s in starts:
            covered[s:s + 243] = True
        assert covered.all()
        seq = rng.random((438, 17, 2)).astype(np.float32)
        clips = make_clips(seq, 243, stride=121)
        assert clips.shape == (3, 243, 17, 2)
        np.testing.assert_array_equal(clips[2], seq[195:438])

    @pytest.mark.slow

    def test_lift_sequence_tail_not_zero(self, rng):
        """End-to-end: lift_sequence output for the tail frames must come
        from the model, not the zero-initialized accumulator."""
        from pose3d_tpu.pipeline.lift import lift_sequence

        model = TemporalLifter(clip_len=27, hidden=32, n_blocks=1, heads=2)
        kp = rng.random((40, 17, 2)).astype(np.float32) * 800
        params = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 27, 17, 2)), train=False)["params"]
        out = lift_sequence(params, model, kp, stride=13)
        # starts 0, 13 cover 0..39 only with the tail anchor (40-27=13 ->
        # dedup); any all-zero tail row means uncovered frames
        assert np.abs(out[-5:]).sum() > 0

    def test_lift_sequence_empty_input(self, rng):
        """T=0 (e.g. a video with zero detected frames) returns an empty
        result instead of crashing on the coverage assert."""
        from pose3d_tpu.pipeline.lift import lift_sequence

        model = TemporalLifter(clip_len=27, hidden=32, n_blocks=1, heads=2)
        params = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 27, 17, 2)), train=False)["params"]
        out = lift_sequence(params, model, np.zeros((0, 17, 2), np.float32))
        assert out.shape == (0, 17, 3)
