"""Unit tests for bench.py's estimator math and budget lean-mode decision.

These pin the two driver-record regressions on file:
- BENCH_r04's per-trial two-K differences went NEGATIVE (-1124.66 ms) when
  a contention spike hit one K1 trial; the median estimator must shrug off
  minority spikes and fall back to a positive upper bound under majority
  spikes.
- BENCH_r04 rc=124 / bench_final's skipped workloads: the lean-mode
  decision trades comparison configs for workload coverage.
"""

import numpy as np
import pytest

from bench import _compile_chain, _lean_decision, _lift_chain, _median_estimate


class TestMedianEstimate:
    def test_clean_samples(self):
        # K1=4 at 50 ms/iter -> 0.2 s; K2=12 -> 0.6 s
        t1s = [0.200, 0.201, 0.199, 0.200, 0.202]
        t2s = [0.600, 0.601, 0.599, 0.600, 0.598]
        per, t1m, t2m, deltas, disp = _median_estimate(t1s, t2s, 4, 12)
        assert per == pytest.approx(0.050, abs=1e-3)
        assert disp["estimator"] == "median_of_5_two_k"
        assert len(deltas) == 5

    def test_minority_spike_on_k1_does_not_go_negative(self):
        # the BENCH_r04 scenario: one K1 trial eats a multi-second
        # contention spike, so ITS per-trial delta is hugely negative —
        # but the median-of-chains estimate must stay at the clean value
        t1s = [0.200, 9.200, 0.199, 0.200, 0.202]  # one spiked trial
        t2s = [0.600, 0.601, 0.599, 0.600, 0.598]
        per, _, _, deltas, _ = _median_estimate(t1s, t2s, 4, 12)
        assert min(deltas) < -1.0  # the raw per-trial delta IS garbage
        assert per == pytest.approx(0.050, abs=1e-3)  # the estimate is not

    def test_majority_spike_falls_back_to_upper_bound(self):
        # >half the K1 chain spiked: median(t1) > median(t2) would give a
        # negative rate; the fallback reports the raw K2 upper bound
        t1s = [5.0, 6.0, 7.0, 0.2, 0.2]
        t2s = [0.600, 0.601, 0.599, 0.600, 0.598]
        per, _, t2m, _, _ = _median_estimate(t1s, t2s, 4, 12)
        assert per > 0
        assert per == pytest.approx(t2m / 12)

    def test_spike_on_k2_inflates_conservatively(self):
        # spikes are one-sided slowdowns; a minority K2 spike must not
        # move the median estimate either
        t1s = [0.200, 0.201, 0.199]
        t2s = [0.600, 9.601, 0.599]
        per, _, _, _, _ = _median_estimate(t1s, t2s, 4, 12)
        assert per == pytest.approx(0.050, abs=1e-3)


class TestDynamicKChain:
    """CPU oracles for the round-5 single-executable two-K chains.

    bench.py's dynamic trip counts (lax.fori_loop with a traced bound)
    exist so K1 and K2 time the SAME compiled executable; these tests pin
    that the chain actually computes the work it claims to time.
    """

    def test_lift_chain_matches_unrolled_iteration(self):
        import jax.numpy as jnp

        # apply = elementwise affine: exactly reproducible on host
        def apply_fn(params, kp):
            return kp * params + 0.25

        params = jnp.float32(1.5)
        x0 = np.linspace(-1.0, 1.0, 2 * 17 * 2).astype(np.float32)
        x0 = x0.reshape(2, 17, 2)

        _, runner = _compile_chain(_lift_chain(apply_fn), params,
                                   jnp.asarray(x0))

        def host_chain(k):
            kp = x0.copy()
            sample = 0.0
            for _ in range(k):
                out = kp * 1.5 + 0.25
                kp = kp + out[..., :2] * 1e-3
                sample = out.reshape(-1)[0]
            return sample

        # one executable must serve BOTH trip counts correctly — that is
        # the whole point of the runtime-k design (identical code for the
        # K1/K2 delta, half the cold compiles)
        for k in (1, 3):
            np.testing.assert_allclose(runner(k)(), host_chain(k),
                                       rtol=1e-6)

    def test_train_chain_matches_epoch_scan(self):
        """bench's fori_loop-of-single-step train chain == the production
        whole-epoch scan: same K2-stacked batches, same rng key, the
        chain's returned loss must equal the scan's last-batch loss (the
        chain must see every batch and thread the state through)."""
        import jax
        import jax.numpy as jnp

        from pose3d_tpu.models.temporal import TemporalLifter
        from pose3d_tpu.train.epoch import make_lifter_epoch_fn
        from pose3d_tpu.train.state import create_train_state
        from pose3d_tpu.train.steps import make_lifter_train_step

        b, t, k2 = 2, 4, 3
        model = TemporalLifter(clip_len=t, n_blocks=1)
        state = create_train_state(model, jax.random.key(0),
                                   jnp.zeros((b, t, 17, 2)), lr=1e-3)
        rng = np.random.default_rng(0)
        y1 = jnp.asarray(rng.random((k2, b, t, 17, 2), np.float32))
        y2 = jnp.asarray(rng.random((k2, b, t, 17, 3), np.float32) - 0.5)
        key = jax.random.key(1)

        single_step = make_lifter_train_step(donate=False)

        def chain(st, y1, y2, key, k):  # mirrors bench.py's train chains
            rngs = jax.random.split(key, k2)

            def body(i, carry):
                st, _ = carry
                st, m = single_step(st, y1[i], y2[i], rngs[i])
                return st, m["loss"].astype(jnp.float32)

            _, loss = jax.lax.fori_loop(0, k, body, (st, jnp.float32(0.0)))
            return loss

        _, runner = _compile_chain(chain, state, y1, y2, key)

        epoch_fn = make_lifter_epoch_fn(donate=False)
        _, metrics = epoch_fn(state, y1, y2, key)

        np.testing.assert_allclose(
            runner(k2)(), float(metrics["last_batch_loss"]), rtol=1e-6)

        # k=1 must run exactly one batch: equal to the single step's loss
        _, m_one = single_step(state, y1[0], y2[0],
                               jax.random.split(key, k2)[0])
        np.testing.assert_allclose(runner(1)(), float(m_one["loss"]),
                                   rtol=1e-6)


class TestLeanDecision:
    def test_plenty_of_budget_runs_full(self):
        assert not _lean_decision(1000.0, 290.0, 475.0)

    def test_tight_budget_goes_lean(self):
        # bench_final's situation entering direct: ~470 s left, full
        # direct costs 290 and downstream floors sum to 475
        assert _lean_decision(470.0, 290.0, 475.0)

    def test_boundary_exact_fit_is_full(self):
        assert not _lean_decision(765.0, 290.0, 475.0)

    def test_override_forces_lean(self):
        assert _lean_decision(10_000.0, 290.0, 475.0, override="1")

    def test_override_forces_full(self):
        assert not _lean_decision(10.0, 290.0, 475.0, override="0")
