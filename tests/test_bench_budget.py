"""Unit tests for bench.py's estimator math and budget lean-mode decision.

These pin the two driver-record regressions on file:
- BENCH_r04's per-trial two-K differences went NEGATIVE (-1124.66 ms) when
  a contention spike hit one K1 trial; the median estimator must shrug off
  minority spikes and fall back to a positive upper bound under majority
  spikes.
- BENCH_r04 rc=124 / bench_final's skipped workloads: the lean-mode
  decision trades comparison configs for workload coverage.
"""

import pytest

from bench import _lean_decision, _median_estimate


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
