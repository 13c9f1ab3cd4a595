"""Pose-space transforms: flips, world->camera, zero-centring.

Behavioral contracts reproduced from the reference:
- ``flip_pose``: phase3_direct/my_HybrIK/utils.py:372-396 — horizontal flip;
  2D poses live in [0,1] image coords so x' = 1 - x, 3D poses are metric so
  x' = -x; left/right joints swap.
- world->camera: phase3_direct/my_HybrIK/H36_dataset.py:354-360 — subtract
  camera translation (converted mm->m) then rotate by the camera orientation
  quaternion.
- zero-centring: H36_dataset.py:209-211 + :286-289 — subtract the root joint
  from joints 1: and zero the root.

TPU-first design: all functions are pure jnp over arbitrary leading batch
axes (the reference loops per-frame in python); flips use a constant gather
permutation which XLA fuses into the surrounding computation.
"""

from __future__ import annotations

import jax.numpy as jnp

from pose3d_tpu.core.quaternion import qv_mult
from pose3d_tpu.core.skeleton import FLIP_PERMUTATION

_FLIP_PERM = jnp.asarray(FLIP_PERMUTATION)


def flip_pose(pose):
    """Horizontally flip (...,17,2) or (...,17,3) poses (utils.py:372-396)."""
    dim = pose.shape[-1]
    if dim == 2:
        x = 1.0 - pose[..., :1]
    elif dim == 3:
        x = -pose[..., :1]
    else:
        raise ValueError(f"expected last dim 2 or 3, got {dim}")
    flipped = jnp.concatenate([x, pose[..., 1:]], axis=-1)
    return jnp.take(flipped, _FLIP_PERM, axis=-2)


def world_to_camera(points, orientation, translation_mm):
    """World-frame (...,3) points -> camera frame (H36_dataset.py:354-360).

    ``orientation``: (...,4) scalar-first quaternion; ``translation_mm``:
    (...,3) camera position in millimetres (divided by 1000 exactly as the
    reference does). Broadcasts over leading axes.
    """
    shifted = points - translation_mm / 1000.0
    return qv_mult(orientation, shifted)


def zero_centre(pose):
    """Root-centre (...,17,D) poses: joints - root, root set to 0.

    Matches H36_dataset.py:209-211 (subtract root from joints 1:) combined
    with :286-289 (root *= 0).
    """
    centred = pose - pose[..., :1, :]
    return centred


def camera_projection(points_cam, focal, center):
    """Pinhole projection of camera-frame (...,3) points to pixels.

    Not present in the reference (it uses precomputed 2D npz files); provided
    for the reprojection-consistency losses (phase5) and the video pipeline.
    ``focal``/``center``: (...,2).
    """
    xy = points_cam[..., :2] / jnp.clip(points_cam[..., 2:], 1e-6)
    return xy * focal + center
