"""Mesh + sharding strategy (GSPMD; replaces the reference's absent comm layer)."""

from pose3d_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
