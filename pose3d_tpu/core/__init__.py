"""Skeleton/camera constants and pure-JAX geometry kernels (layer L0/L1)."""

from pose3d_tpu.core import cameras, quaternion, skeleton, transforms  # noqa: F401
from pose3d_tpu.core.quaternion import q_conjugate, q_mult, qv_mult, quat_to_rotmat  # noqa: F401
from pose3d_tpu.core.skeleton import (  # noqa: F401
    BONES,
    COCO_TO_H36M_MATRIX,
    FLIP_PERMUTATION,
    H36M_KEYPOINTS_FROM_32,
    JOINT_NAMES,
    LEFT_JOINTS,
    NUM_JOINTS,
    RIGHT_JOINTS,
    coco_to_h36m,
)
from pose3d_tpu.core.transforms import (  # noqa: F401
    camera_projection,
    flip_pose,
    world_to_camera,
    zero_centre,
)
