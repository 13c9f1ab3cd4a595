"""Jitted train/eval steps for the 2D->3D lifting task.

TPU-native replacement for the reference's per-batch python loop body
(phase1_lifting/train_1.py:73-100): one fused XLA program per step doing
forward, loss, backward, optimizer update, and metric accumulation, with the
train state donated (no HBM copy per step).

Metric convention: each step returns the per-joint MPJPE sums of the batch
(reference ``loss_MPJPE``); the epoch loop accumulates and finalizes with
:func:`pose3d_tpu.losses.mpjpe_mm`.

Flip test-time augmentation: the reference's validation flip path
(train_1.py:128-134) contains an operand-ordering bug (it averages the flip
of the *unflipped* input's prediction). We implement the documented intent —
predict on the flipped input, flip the prediction back, average — which is
also what phase5 does correctly at train_5.py:258-277.
"""

from __future__ import annotations

import functools

import jax

from pose3d_tpu import losses
from pose3d_tpu.core.transforms import flip_pose
from pose3d_tpu.train.schedule import plateau_update

LOSS_FNS = {"mse": losses.mse, "l1": losses.l1}


def _apply(state, params, x, *, train, rng=None):
    """Run the model, handling the batch_stats collection if present."""
    variables = {"params": params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
        out, updates = state.apply_fn(
            variables, x, train=train,
            rngs={"dropout": rng} if rng is not None else None,
            mutable=["batch_stats"] if train else [],
        )
        new_bs = updates.get("batch_stats", state.batch_stats) if train else None
        return out, new_bs
    out = state.apply_fn(
        variables, x, train=train,
        rngs={"dropout": rng} if rng is not None else None,
    )
    return out, None


def make_lifter_train_step(loss: str = "mse", donate: bool = True):
    """Build a jitted (state, y1, y2, rng) -> (state, metrics) step.

    y1: (B,17,2) inputs; y2: (B,17,3) targets. The learning rate is read
    from the on-device plateau state every step.
    """
    loss_fn_ = LOSS_FNS[loss]

    def step(state, y1, y2, rng):
        def loss_fn(params):
            out, new_bs = _apply(state, params, y1, train=True, rng=rng)
            pred = out.reshape(y2.shape)
            return loss_fn_(pred, y2), (pred, new_bs)

        (loss_val, (pred, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.with_lr(state.plateau.lr)
        state = state.apply_gradients(grads, new_bs)
        metrics = {
            "loss": loss_val,
            "mpjpe_sums": losses.loss_mpjpe(pred, y2),
        }
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_dp_lifter_train_step(mesh, loss: str = "mse", donate: bool = True):
    """Data-parallel lifter train step via ``shard_map`` — the mesh path
    for apply_fns built from Pallas kernels.

    The GSPMD jit path (annotate shardings, let XLA partition) cannot
    split a ``pallas_call``: fused-kernel train steps
    (ops/pallas_stblock_train.make_fused_train_apply) would replicate or
    fail under it. Here each shard runs the identical single-chip program
    on its batch slice; loss and grads are ``pmean``ed and per-joint MPJPE
    sums ``psum``ed over the data axis — numerically the global-batch
    step, since MSE/L1 means over equal shards compose exactly.

    Stats-free models only (the temporal lifter has no BatchNorm); BN
    models keep the GSPMD path where batch stats are globally reduced
    (tests/test_mesh_image.py).
    """
    from jax.sharding import PartitionSpec as P

    from pose3d_tpu.parallel.mesh import DATA_AXIS

    loss_fn_ = LOSS_FNS[loss]

    def step(state, y1, y2, rng):
        if state.batch_stats:
            raise ValueError(
                "shard_map DP step supports stats-free models only; "
                "BatchNorm models go through the GSPMD jit path")

        apply_fn = state.apply_fn  # static — safe to close over

        def per_shard(params, y1s, y2s, r):
            # distinct dropout stream per shard, as one global batch would
            r = jax.random.fold_in(r, jax.lax.axis_index(DATA_AXIS))

            def loss_fn(p):
                out = apply_fn({"params": p}, y1s, train=True,
                               rngs={"dropout": r})
                pred = out.reshape(y2s.shape)
                return loss_fn_(pred, y2s), pred

            (lv, pred), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            lv = jax.lax.pmean(lv, DATA_AXIS)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            mpjpe = jax.lax.psum(losses.loss_mpjpe(pred, y2s), DATA_AXIS)
            return lv, grads, mpjpe

        loss_val, grads, mpjpe = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P()),
            # pallas_call out_shapes carry no varying-manner annotation;
            # replication of the outputs is guaranteed by the pmean/psum
            check_vma=False,
        )(state.params, y1, y2, rng)
        state = state.with_lr(state.plateau.lr)
        state = state.apply_gradients(grads, None)
        return state, {"loss": loss_val, "mpjpe_sums": mpjpe}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_lifter_eval_step(loss: str = "mse", flip_tta: bool = False):
    """Build a jitted (state, y1, y2) -> metrics eval step.

    With ``flip_tta`` the prediction is averaged with the flipped-input
    prediction mapped back through the flip (train_1.py Flip path intent;
    both forwards run in one XLA program as a batched vmap over
    {identity, flip} rather than two sequential dispatches).
    """
    loss_fn_ = LOSS_FNS[loss]

    def step(state, y1, y2):
        pred, _ = _apply(state, state.params, y1, train=False)
        pred = pred.reshape(y2.shape)
        if flip_tta:
            pred_f, _ = _apply(state, state.params, flip_pose(y1), train=False)
            pred = (flip_pose(pred_f.reshape(y2.shape)) + pred) / 2.0
        return {
            "loss": loss_fn_(pred, y2),
            "mpjpe_sums": losses.loss_mpjpe(pred, y2),
            "pred": pred,
        }

    return jax.jit(step)


@functools.partial(jax.jit, donate_argnums=(0,))
def plateau_step(state, metric):
    """End-of-epoch scheduler step (reference: lr_schdlr.step(loss),
    train_1.py:106 — fed with the last train batch's loss)."""
    return state.replace(plateau=plateau_update(state.plateau, metric))
