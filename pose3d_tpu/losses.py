"""Losses and the MPJPE metric convention.

Reference contracts:
- ``loss_MPJPE`` (phase5_loop/losses.py:3-7, redefined ~6x across phases):
  per-joint L2 norms summed over the batch -> (J,) vector. Trainers
  accumulate it over an epoch, divide by dataset size, average joints 1:,
  and scale by (17/16)*1000 when the root is zero-centred
  (phase1_lifting/train_1.py:100-104, phase3 train_3.py:99-101) => mm.
- ``TriangleLoss`` (losses.py:10-62): cycle-consistency variant —
  L1(pred2d, gt2d) + L1(pred3d, gt3d) + L1(lift(pred2d), pred3d)
  [+ L1(root-centred proj(pred3d), root-centred pred2d)].
- ``TriangleLoss_sep`` (losses.py:65-118): supervised variant —
  adds domain_gap = L1(lift(pred2d), lift(gt2d)) and
  loss_lift = L1(lift(gt2d), gt3d)
  [+ proj gap terms vs gt projections].

Documented deviation (not replicated): the reference root-centres the
projection terms with ``proj[1:] -= proj[0]`` on (B,17,2) tensors
(losses.py:34-37, 91-94) — that indexes the *batch* axis, subtracting sample
0 from samples 1:. The evident intent is root-joint centring; we centre over
the joint axis (axis=-2). See SURVEY.md section 7.3 item 6 for the
reproduce-contracts-not-bugs policy.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse(pred, target):
    return jnp.mean(jnp.square(pred - target))


def loss_mpjpe(pred, target):
    """Per-joint L2 error summed over all leading axes:
    (..., J, D) -> (J,). For (B,J,D) this is exactly the reference
    ``loss_MPJPE`` (losses.py:3-7); clip inputs (B,T,J,D) also sum over time.
    """
    err = jnp.linalg.norm(pred - target, axis=-1)
    return jnp.sum(err, axis=tuple(range(err.ndim - 1)))


def mpjpe_mm(per_joint_sums, dataset_size, num_joints: int = 17,
             zero_centred: bool = True):
    """Finalize accumulated per-joint sums into the reference's mm metric.

    mean over joints 1: (the root is exactly zero when zero-centred), then
    x (17/16) x 1000 (train_1.py:102-104).
    """
    metric = jnp.mean(per_joint_sums[1:num_joints] / dataset_size)
    if num_joints == 17 and zero_centred:
        metric = metric * (17.0 / 16.0) * 1000.0
    return metric


def _root_centre(x):
    return x - x[..., :1, :]


def triangle_loss(pred_2d, pred_3d, lift_of_pred2d, gt_2d, gt_3d,
                  proj_of_pred3d=None):
    """Cycle-consistency triangle loss (reference ``TriangleLoss``).

    Returns (total, dict of per-term values). The lift term couples the two
    predictions: L1(lift(pred2d), pred3d) (losses.py:30).

    Deliberate divergence, documented not reproduced: the reference's proj
    term "centres" by subtracting the FIRST BATCH ELEMENT
    (``proj_3d_pred[1:] -= proj_3d_pred[0]``, losses.py:35-38 — dim 0 is the
    batch, so sample 0 becomes everyone's reference). Here both sides are
    root-joint-centred instead, which is the evident intent.
    """
    terms = {
        "loss_2d": l1(pred_2d, gt_2d),
        "loss_3d": l1(pred_3d, gt_3d),
        "loss_lift": l1(lift_of_pred2d, pred_3d),
    }
    total = terms["loss_2d"] + terms["loss_3d"] + terms["loss_lift"]
    if proj_of_pred3d is not None:
        terms["loss_proj"] = l1(_root_centre(proj_of_pred3d), _root_centre(pred_2d))
        total = total + terms["loss_proj"]
    return total, terms


def triangle_loss_sep(pred_2d, pred_3d, lift_of_gt2d, lift_of_pred2d,
                      gt_2d, gt_3d, proj_of_pred3d=None, proj_of_gt3d=None):
    """Supervised triangle loss (reference ``TriangleLoss_sep``).

    total = 2d + 3d + lift + domain_gap (+ proj + proj_gap), with
    domain_gap = L1(lift(pred2d), lift(gt2d)) (losses.py:86) and
    lift = L1(lift(gt2d), gt3d) (losses.py:87).
    """
    terms = {
        "loss_2d": l1(pred_2d, gt_2d),
        "loss_3d": l1(pred_3d, gt_3d),
        "loss_domain_gap": l1(lift_of_pred2d, lift_of_gt2d),
        "loss_lift": l1(lift_of_gt2d, gt_3d),
    }
    total = sum(terms.values())
    if proj_of_pred3d is not None:
        assert proj_of_gt3d is not None
        pp, pg = _root_centre(proj_of_pred3d), _root_centre(proj_of_gt3d)
        terms["loss_gap_proj"] = l1(pp, pg)
        terms["loss_proj"] = l1(pg, _root_centre(gt_2d))
        total = total + terms["loss_gap_proj"] + terms["loss_proj"]
    return total, terms
