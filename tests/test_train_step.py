"""End-to-end lifting train step: sharded over the 8-device mesh, loss drops.

This is the minimum end-to-end slice of SURVEY.md section 7.2 exercised in CI:
synthetic H36M keypoints -> sharded batches -> jitted train step (forward,
MSE, backward, AdamW, plateau-lr) -> MPJPE metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu import losses
from pose3d_tpu.data import synthetic
from pose3d_tpu.data.feed import batch_iterator, prefetch_to_device
from pose3d_tpu.models.lifters import JointTransformerLifter, MartinezLifter
from pose3d_tpu.parallel.mesh import make_mesh, replicated
from pose3d_tpu.train.state import create_train_state
from pose3d_tpu.train.steps import (
    make_lifter_eval_step,
    make_lifter_train_step,
    plateau_step,
)


def _make_data(n=256):
    kp2d, kp3d = synthetic.synthetic_h36m(n)
    kp3d = kp3d - kp3d[:, :1]  # zero-centre
    return kp2d, kp3d


def _train(model, n_steps=30, batch=64, mesh=None, lr=1e-3):
    kp2d, kp3d = _make_data()
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((batch, 17, kp2d.shape[-1])), lr=lr
    )
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
    step = make_lifter_train_step(loss="mse", donate=False)
    it = batch_iterator((kp2d, kp3d), batch, shuffle=True)
    if mesh is not None:
        it = prefetch_to_device(it, mesh)
    losses_seen = []
    for i, (y1, y2) in enumerate(it):
        if i >= n_steps:
            break
        state, metrics = step(state, jnp.asarray(y1), jnp.asarray(y2),
                              jax.random.key(i))
        losses_seen.append(float(metrics["loss"]))
    return state, losses_seen


class TestTrainStep:
    def test_loss_decreases_martinez(self):
        _, losses_seen = _train(MartinezLifter(dropout=0.0), n_steps=40)
        assert losses_seen[-1] < losses_seen[0] * 0.5, losses_seen[::8]

    @pytest.mark.slow

    def test_loss_decreases_transformer_sharded(self, devices):
        mesh = make_mesh(n_data=8)
        _, losses_seen = _train(JointTransformerLifter(), mesh=mesh, n_steps=40)
        assert losses_seen[-1] < losses_seen[0] * 0.5, losses_seen[::8]

    def test_batch_is_actually_sharded(self, devices):
        mesh = make_mesh(n_data=8)
        kp2d, kp3d = _make_data(64)
        it = prefetch_to_device(batch_iterator((kp2d, kp3d), 64, shuffle=False), mesh)
        y1, y2 = next(it)
        assert len(y1.sharding.device_set) == 8
        # each device holds 1/8 of the batch
        assert y1.addressable_shards[0].data.shape[0] == 8

    def test_eval_step_flip_tta(self):
        model = JointTransformerLifter()
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((4, 17, 2)), lr=1e-3
        )
        ev = make_lifter_eval_step(flip_tta=True)
        kp2d, kp3d = _make_data(4)
        m = ev(state, jnp.asarray(kp2d), jnp.asarray(kp3d))
        assert np.isfinite(float(m["loss"]))
        assert m["pred"].shape == (4, 17, 3)

    def test_plateau_integration(self):
        model = MartinezLifter(dropout=0.0)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((8, 17, 2)), lr=1e-4
        )
        for _ in range(6):
            state = plateau_step(state, 1.0)  # flat metric: reduce after 5
        np.testing.assert_allclose(float(state.plateau.lr), 7e-5, rtol=1e-5)

    def test_lr_flows_into_optimizer(self):
        """After a plateau reduction the injected hyperparam follows."""
        model = MartinezLifter(dropout=0.0)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((8, 17, 2)), lr=1e-4
        )
        for _ in range(6):
            state = plateau_step(state, 1.0)
        step = make_lifter_train_step(donate=False)
        kp2d, kp3d = _make_data(8)
        state, _ = step(state, jnp.asarray(kp2d), jnp.asarray(kp3d),
                        jax.random.key(0))
        np.testing.assert_allclose(
            float(state.opt_state.hyperparams["learning_rate"]), 7e-5, rtol=1e-5
        )


class TestEpochMetric:
    def test_mpjpe_accumulation_convention(self):
        """Accumulate per-joint sums over an epoch then finalize: equals the
        direct whole-batch computation."""
        kp2d, kp3d = _make_data(128)
        pred = kp3d + 0.01
        sums = np.zeros(17)
        for s in range(0, 128, 32):
            sums += np.asarray(
                losses.loss_mpjpe(jnp.asarray(pred[s:s+32]), jnp.asarray(kp3d[s:s+32]))
            )
        got = float(losses.mpjpe_mm(jnp.asarray(sums), 128))
        direct = float(
            losses.mpjpe_mm(losses.loss_mpjpe(jnp.asarray(pred), jnp.asarray(kp3d)), 128)
        )
        np.testing.assert_allclose(got, direct, rtol=1e-4)
