"""Data layer: H36M keypoints, normalization stats, synthetic data, device feed."""

from pose3d_tpu.data import feed, h36m, stats, synthetic  # noqa: F401
