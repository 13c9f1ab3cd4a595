"""Training step for the full SMPL-IK pose model (HybrIKPose).

The reference ships the Simple3DPoseBaseSMPL model but no trainer for it
(phase3's test.py only instantiates it; SURVEY.md §2.3). This step makes the
family trainable end-to-end in this framework: L1 on the 24-joint uvd
prediction plus L1 on the IK-reconstructed 17 H36M joints (differentiating
through the naive IK path, the reference's train-time dispatch,
lbs.py:356-365) and an L2 pull of the predicted betas toward the mean shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose3d_tpu import losses


def make_hybrik_train_step(assembly, *, uvd_weight: float = 1.0,
                           xyz17_weight: float = 1.0,
                           beta_weight: float = 1e-2, donate: bool = True):
    """assembly: models.smpl_pose.HybrIKPose.

    (state, frames, cam (trans_inv, k_inv, root, depth), uvd29_gt, xyz17_gt,
    rng) -> (state, metrics). ``state`` is a TrainState over the PoseSMPLNet
    params (apply_fn unused; the assembly closes over the net).
    """

    def step(state, frames, cam, uvd29_gt, xyz17_gt, rng):
        trans_inv, k_inv, root, depth = cam

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, new_vars = assembly.apply(
                variables, frames, trans_inv, k_inv, root, depth,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            uvd = out["pred_uvd_jts"].reshape(uvd29_gt.shape)
            xyz17 = out["pred_xyz_jts_17"].reshape(xyz17_gt.shape)
            total = (
                uvd_weight * losses.l1(uvd, uvd29_gt)
                + xyz17_weight * losses.l1(xyz17, xyz17_gt)
                + beta_weight * jnp.mean(jnp.square(out["pred_delta_shape"]))
            )
            return total, (xyz17, new_vars["batch_stats"])

        (loss_val, (xyz17, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.with_lr(state.plateau.lr)
        state = state.apply_gradients(grads, new_bs)
        return state, {
            "loss": loss_val,
            "mpjpe_sums": losses.loss_mpjpe(xyz17, xyz17_gt),
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())
