"""Interop: converters from reference-format torch state dicts to flax trees.

Lets a user of the reference repo (RHnejad/3D_PoseEstimation) carry their
trained checkpoints into this framework: every reference model family has a
``*_from_torch`` converter returning ``{"params": ..., "batch_stats": ...}``
variables directly usable with ``Model.apply``.
"""

from pose3d_tpu.interop.torch_weights import (
    ae_from_torch,
    martinez_from_torch,
    posenet2d_from_torch,
    posenet3d_from_torch,
    projection_from_torch,
    resnet_from_torch,
    vit_lifter_from_torch,
)

__all__ = [
    "martinez_from_torch",
    "ae_from_torch",
    "vit_lifter_from_torch",
    "resnet_from_torch",
    "posenet3d_from_torch",
    "posenet2d_from_torch",
    "projection_from_torch",
]
