"""Model zoo: lifters, backbones, heatmap heads, temporal, SMPL/IK."""

from pose3d_tpu.models.lifters import (  # noqa: F401
    AELifter,
    JointTransformerLifter,
    MartinezLifter,
)
