"""Parity of the fused temporal-serving forward (spatial sub-block
megakernel + flat-row temporal branch) vs the flax TemporalLifter apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.models.temporal import TemporalLifter
from pose3d_tpu.ops.pallas_stblock import temporal_forward_fused


@pytest.fixture(scope="module")
def setup():
    model = TemporalLifter(clip_len=27, n_blocks=2)
    rng = np.random.default_rng(3)
    # C*T = 32*27 = 864: a multiple of the kernel's 32-frame cell
    x = jnp.asarray(rng.random((32, 27, 17, 2)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x[:2])["params"]
    return model, params, x


class TestTemporalForwardFused:
    @pytest.mark.slow
    def test_matches_bf16_apply(self, setup):
        model, params, x = setup
        bf16 = TemporalLifter(clip_len=27, n_blocks=2, dtype=jnp.bfloat16)
        want = np.asarray(bf16.apply({"params": params}, x))
        got = np.asarray(temporal_forward_fused(
            params, x, n_blocks=2, clip_len=27, interpret=True))
        assert got.shape == (32, 27, 17, 3)
        err = np.abs(got - want).max()
        assert err < 5e-2, f"max abs err {err}"

    def test_close_to_f32_apply(self, setup):
        model, params, x = setup
        want = np.asarray(model.apply({"params": params}, x))
        got = np.asarray(temporal_forward_fused(
            params, x, n_blocks=2, clip_len=27, interpret=True))
        err = np.abs(got - want).max()
        assert err < 0.1, f"max abs err {err}"

    @pytest.mark.slow
    def test_grouped_matches_per_head_serving(self, setup, monkeypatch):
        """ATTN_GROUP in the SERVING kernels (round 5 ported the train
        kernels' grouped-head attention to spatial/temporal serving):
        grouped whole-trunk forward == the per-head one within bf16
        rounding — the two forms take the f32 softmax-normalizer sum in
        different orders (seg-sum matmul vs row reduction), so ~2-ulp
        bf16 deltas compound through the 2-block residual trunk (measured
        max 0.016 on this seed; the flax-oracle tests above bound BOTH
        forms at 5e-2 independently). clear_cache(): the kernel entry
        points are jitted and ATTN_GROUP is read at trace time."""
        import pose3d_tpu.ops.pallas_stblock as sb

        _, params, x = setup

        def run():
            sb.spatial_block_fused.clear_cache()
            sb.temporal_block_fused.clear_cache()
            sb.temporal_slab_fused.clear_cache()
            return np.asarray(temporal_forward_fused(
                params, x[:4], n_blocks=2, clip_len=27, interpret=True))

        monkeypatch.setattr(sb, "ATTN_GROUP", 4)
        got_g = run()
        monkeypatch.setattr(sb, "ATTN_GROUP", None)
        got_p = run()
        np.testing.assert_allclose(got_g, got_p, atol=3e-2, rtol=3e-2)

    def test_bad_shapes_raise(self, setup):
        _, params, x = setup
        with pytest.raises(ValueError, match="expected"):
            temporal_forward_fused(params, x[:, :20], n_blocks=2,
                                   clip_len=27, interpret=True)

    @pytest.mark.slow

    def test_row_padding_any_clip_count(self, setup):
        """C=3 (C*T = 81 frames, not a multiple of 32): the spatial kernel
        row-pads internally; result must equal the C=32 run's first 3."""
        _, params, x = setup
        full = np.asarray(temporal_forward_fused(
            params, x, n_blocks=2, clip_len=27, interpret=True))
        small = np.asarray(temporal_forward_fused(
            params, x[:3], n_blocks=2, clip_len=27, interpret=True))
        np.testing.assert_array_equal(small, full[:3])

    def test_slab_matches_joint_major_kernel(self, setup):
        """temporal_slab_fused (frame-major, per-joint lane slices) is
        bit-identical to temporal_block_fused (joint-major sequences) —
        identical op order per sequence, only the layout differs."""
        _, params, _ = setup
        from pose3d_tpu.ops.pallas_stblock import (
            DIM,
            pack_temporal_weights,
            temporal_block_fused,
            temporal_slab_fused,
        )

        w = pack_temporal_weights(
            params["SpatioTemporalBlock_0"], dtype=jnp.float32)
        c, t, j = 3, 27, 17
        x = jnp.asarray(np.random.default_rng(5)
                        .standard_normal((c, t, j, DIM)).astype(np.float32))
        ref = np.asarray(temporal_block_fused(
            x.transpose(0, 2, 1, 3).reshape(c * j, t, DIM), w,
            interpret=True)).reshape(c, j, t, DIM).transpose(0, 2, 1, 3)
        got = np.asarray(temporal_slab_fused(
            x.reshape(c, t, j * DIM), w, interpret=True)
        ).reshape(c, t, j, DIM)
        np.testing.assert_array_equal(got, ref)

    def test_clip_isolation(self, setup):
        """Clips must not attend across each other through any branch."""
        _, params, x = setup
        base = np.asarray(temporal_forward_fused(
            params, x, n_blocks=2, clip_len=27, interpret=True))
        pert = np.asarray(temporal_forward_fused(
            params, x.at[0].add(1.0), n_blocks=2, clip_len=27,
            interpret=True))
        np.testing.assert_array_equal(base[1:], pert[1:])
