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


class TestPolyErf:
    """The kernels' erf is a clamped odd polynomial (round 5 — the A&S
    exp+divide form was 30% of the flagship iter, lift_floor_probe.log);
    these pin its accuracy contract and the train kernels' gradient
    consistency."""

    def test_erf_max_error(self):
        """|poly erf - scipy erf| < 5e-5 over all magnitudes incl. the
        clamp tail — ~150x below bf16 resolution, so GELU built on it is
        bf16-indistinguishable from exact."""
        from scipy.special import erf as scipy_erf

        from pose3d_tpu.ops.pallas_lifter import _erf

        x = np.linspace(-8.0, 8.0, 200_001).astype(np.float32)
        got = np.asarray(jax.jit(_erf)(jnp.asarray(x)))
        err = np.abs(got - scipy_erf(x.astype(np.float64)))
        assert err.max() < 5e-5, f"max erf err {err.max():.2e}"

    def test_gelu_grad_is_exact_derivative_of_forward(self):
        """_gelu_grad must equal jax.grad of the polynomial gelu the
        forward kernels actually compute (fwd/bwd consistency — the
        backward is hand-written in the fused train kernels). Tolerance
        is f32 reassociation: autodiff evaluates the same derivative
        through a different expression tree than the hand Horner
        P + 2s·P' (measured max 4.9e-5)."""
        from pose3d_tpu.ops.pallas_lifter import _gelu
        from pose3d_tpu.ops.pallas_stblock_train import _gelu_grad

        x = jnp.asarray(np.linspace(-6.0, 6.0, 20_001).astype(np.float32))
        want = jax.vmap(jax.grad(lambda v: _gelu(v)))(x)
        got = _gelu_grad(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=0)
