"""Jitted train/eval steps for the direct image->3D models (phases 3/4/5).

Reference loop bodies: phase3 train_3.py:60-97 (MSE on soft-argmax coords,
Adam wd 1e-8), phase4 train.py (same shape, z_scale 2.0), with the optional
heatmap-MSE supervision phase5 keeps commented (train_5.py:187-189) exposed
as ``heatmap_loss_weight``.

TPU-native details:
- the 17x64^3 Gaussian targets are synthesized ON DEVICE inside the step
  (pose3d_tpu.ops.heatmap) instead of the reference's per-item host numpy
  build (H36_dataset.py:196-202) — the dominant host-side cost in the
  reference's input pipeline (SURVEY.md section 3.1);
- steps never sync to host; metrics return as device scalars the epoch loop
  collects and reads once per epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose3d_tpu import losses
from pose3d_tpu.ops.heatmap import heatmap_targets
from pose3d_tpu.train.steps import LOSS_FNS


def make_direct_train_step(loss: str = "mse", heatmap_loss_weight: float = 0.0,
                           donate: bool = True):
    """(state, frames (B,H,W,3), kp3d (B,17,3), rng) -> (state, metrics).

    The model is a PoseNet3D-style apply returning (coords (B,51), heatmap).
    """
    loss_fn_ = LOSS_FNS[loss]

    def step(state, frames, kp3d, rng):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (coords, hm), updates = state.apply_fn(
                variables, frames, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            pred = coords.reshape(kp3d.shape)
            total = loss_fn_(pred, kp3d)
            if heatmap_loss_weight:
                hm_gt = heatmap_targets(jnp.clip(kp3d, -1.0, 1.0),
                                        grid=hm.shape[-3:])
                total = total + heatmap_loss_weight * losses.mse(hm, hm_gt)
            return total, (pred, updates["batch_stats"])

        (loss_val, (pred, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.with_lr(state.plateau.lr)
        state = state.apply_gradients(grads, new_bs)
        return state, {
            "loss": loss_val,
            "mpjpe_sums": losses.loss_mpjpe(pred, kp3d),
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_direct_eval_step(loss: str = "mse"):
    loss_fn_ = LOSS_FNS[loss]

    def step(state, frames, kp3d):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        coords, _ = state.apply_fn(variables, frames, train=False)
        pred = coords.reshape(kp3d.shape)
        return {
            "loss": loss_fn_(pred, kp3d),
            "mpjpe_sums": losses.loss_mpjpe(pred, kp3d),
            "pred": pred,
        }

    return jax.jit(step)
