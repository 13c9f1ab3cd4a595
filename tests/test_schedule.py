"""Plateau LR schedule vs the actual torch ReduceLROnPlateau as oracle."""

import numpy as np
import pytest

from pose3d_tpu.train.schedule import plateau_init, plateau_update

torch = pytest.importorskip("torch")


def _torch_oracle(metrics, lr0, **kw):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=kw.get("factor", 0.7), patience=kw.get("patience", 3),
        cooldown=kw.get("cooldown", 2), min_lr=kw.get("min_lr", 5e-6),
    )
    lrs = []
    for m in metrics:
        sched.step(m)
        lrs.append(opt.param_groups[0]["lr"])
    return lrs


def _ours(metrics, lr0, **kw):
    state = plateau_init(lr0)
    lrs = []
    for m in metrics:
        state = plateau_update(state, m, **kw)
        lrs.append(float(state.lr))
    return lrs


class TestPlateau:
    def test_monotone_decrease_matches_torch(self):
        # strictly improving: no reductions
        metrics = [1.0 / (i + 1) for i in range(20)]
        np.testing.assert_allclose(
            _ours(metrics, 1e-4), _torch_oracle(metrics, 1e-4), rtol=1e-6
        )

    def test_flat_metric_matches_torch(self):
        metrics = [1.0] * 30
        np.testing.assert_allclose(
            _ours(metrics, 1e-4), _torch_oracle(metrics, 1e-4), rtol=1e-6
        )

    def test_noisy_metric_matches_torch(self):
        rng = np.random.default_rng(3)
        metrics = list(1.0 + 0.1 * rng.standard_normal(60))
        np.testing.assert_allclose(
            _ours(metrics, 1e-3), _torch_oracle(metrics, 1e-3), rtol=1e-6
        )

    def test_min_lr_floor(self):
        metrics = [1.0] * 200
        lrs = _ours(metrics, 1e-4)
        assert lrs[-1] >= 5e-6 - 1e-12
        np.testing.assert_allclose(
            lrs, _torch_oracle(metrics, 1e-4), rtol=1e-6
        )

    def test_reference_hyperparams_default(self):
        """factor .7 / patience 3 / cooldown 2 / min_lr 5e-6 (train_1.py:41)."""
        state = plateau_init(1e-4)
        # 5 bad epochs (patience 3 exceeded at the 5th): one reduction
        for _ in range(5):
            state = plateau_update(state, 1.0)
        np.testing.assert_allclose(float(state.lr), 1e-4 * 0.7, rtol=1e-6)
