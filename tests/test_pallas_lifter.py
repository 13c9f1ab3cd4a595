"""Parity of the fused Pallas lifter trunk vs the flax JointTransformerLifter.

The kernel is inference-only and bf16; parity targets:
- vs the bf16 flax apply (the benched configuration): tight, same math at
  a different reassociation order;
- vs the f32 flax apply: loose (bf16 quantization of ~1.6M params).

Runs in interpret mode on the CPU mesh (conftest pins the cpu platform);
the same code path compiles for real on TPU (exercised by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.models.lifters import (
    JointTransformerLifter,
    sinusoidal_positional_embeddings,
)
from pose3d_tpu.ops.pallas_lifter import lifter_forward_fused


@pytest.fixture(scope="module")
def lifter_setup():
    model = JointTransformerLifter()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((128, 17, 2)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x, train=False)[
        "params"]
    pe = sinusoidal_positional_embeddings(17, 256)
    return model, params, x, pe


class TestFusedLifterParity:
    def test_matches_bf16_flax_apply(self, lifter_setup):
        model, params, x, pe = lifter_setup
        bf16_model = JointTransformerLifter(dtype=jnp.bfloat16)
        want = bf16_model.apply({"params": params}, x, train=False)
        got = lifter_forward_fused(params, x, pe=pe, interpret=True)
        assert got.shape == (128, 17, 3)
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-2)

    def test_close_to_f32_flax_apply(self, lifter_setup):
        model, params, x, pe = lifter_setup
        want = model.apply({"params": params}, x, train=False)
        got = lifter_forward_fused(params, x, pe=pe, interpret=True)
        # bf16 weights + activations vs f32: loose but bounded
        err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
        assert err < 0.1, f"max abs err {err}"

    def test_batch_not_row_multiple_raises(self, lifter_setup):
        _, params, x, pe = lifter_setup
        with pytest.raises(ValueError, match="multiple"):
            lifter_forward_fused(params, x[:60], pe=pe, interpret=True)

    def test_attention_mask_isolation(self, lifter_setup):
        """Frames must not attend across each other: perturbing frame 0
        leaves every other frame's output bit-identical."""
        _, params, x, pe = lifter_setup
        base = lifter_forward_fused(params, x, pe=pe, interpret=True)
        x2 = x.at[0].set(x[0] + 1.0)
        pert = lifter_forward_fused(params, x2, pe=pe, interpret=True)
        np.testing.assert_array_equal(np.asarray(base[1:]),
                                      np.asarray(pert[1:]))
        assert np.abs(np.asarray(base[0]) - np.asarray(pert[0])).max() > 0
