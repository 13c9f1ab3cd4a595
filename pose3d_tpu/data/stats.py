"""Normalization statistics with the reference's exact numeric semantics.

Reference contract (phase3_direct/my_HybrIK/H36_dataset.py:205-259):
- mean is accumulated in the dataset dtype (float32): ``np.sum(dataset, 0) / n``
- the squared-deviation accumulator starts as a float64 zeros buffer and each
  float32 squared diff is added to it, so **std comes out float64** while mean
  stays float32 (this f32/f64 mix is visible in the committed
  phase1_lifting/{mean,std}_train_{2d,3d}.npy artifacts). The mean and the
  dtype contract are reproduced bit-for-bit; the std sums the identical f64
  terms but with numpy's vectorized pairwise order instead of the reference's
  frame-by-frame loop, so values agree to f64 rounding order (tested at
  rtol 1e-10, typically < 1e-14) rather than bit-for-bit;
- ``max_train_3d``/``min_train_3d`` are computed then immediately overridden
  to +-1 (H36_dataset.py:236-243) — reproduced;
- train split computes-and-saves, eval split loads (file layout
  ``<stats_dir>/{mean,std}_train_{2d,3d}.npy`` kept for API parity).
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np


@dataclasses.dataclass
class NormStats:
    """Per-joint normalization statistics for one coordinate dimensionality."""

    mean: np.ndarray  # (J, D) float32
    std: np.ndarray   # (J, D) float64
    max: np.ndarray | None = None  # (J, 3), forced to +1 (3D only)
    min: np.ndarray | None = None  # (J, 3), forced to -1 (3D only)


def compute_stats(dataset: np.ndarray) -> NormStats:
    """Mean/std over frames of a (N, J, D) array, reference numerics.

    Mean: float32 accumulation (np.sum over a float32 array stays float32),
    bit-equal to the reference. Std: biased (divide by N, not N-1), float64
    accumulation of float32 squared deviations — same terms as
    H36_dataset.py:214-222 but pairwise-summed (see module docstring).
    """
    n_frames, n_joints, dim = dataset.shape
    data_mean = np.sum(dataset, axis=0) / n_frames

    # float32 squared deviations summed into a float64 accumulator. np.power
    # (not np.square): powf rounds differently from x*x in float32 and the
    # reference uses np.power (H36_dataset.py:220).
    sq = np.power(dataset - data_mean, 2)  # float32 elementwise, like the loop body
    diff_sq2_sum = sq.astype(np.float64).sum(axis=0)
    data_std = np.sqrt(diff_sq2_sum / n_frames)

    stats = NormStats(mean=data_mean, std=data_std)
    if dim == 3:
        # The reference computes max/min then overrides both to +-1
        # (H36_dataset.py:236-243); only the override survives.
        stats.max = np.ones((n_joints, 3))
        stats.min = -np.ones((n_joints, 3))
    return stats


def _paths(stats_dir, dim: int):
    d = pathlib.Path(stats_dir)
    suffix = f"{dim}d"
    out = {
        "mean": d / f"mean_train_{suffix}.npy",
        "std": d / f"std_train_{suffix}.npy",
    }
    if dim == 3:
        out["max"] = d / "max_train_3d.npy"
        out["min"] = d / "min_train_3d.npy"
    return out


def save_stats(stats: NormStats, stats_dir) -> None:
    """Persist in the reference's logs/run_time_utils file layout."""
    dim = stats.mean.shape[-1]
    pathlib.Path(stats_dir).mkdir(parents=True, exist_ok=True)
    paths = _paths(stats_dir, dim)
    np.save(paths["mean"], stats.mean)
    np.save(paths["std"], stats.std)
    if dim == 3:
        np.save(paths["max"], stats.max)
        np.save(paths["min"], stats.min)


def load_stats(stats_dir, dim: int) -> NormStats:
    paths = _paths(stats_dir, dim)
    stats = NormStats(mean=np.load(paths["mean"]), std=np.load(paths["std"]))
    if dim == 3:
        stats.max = np.load(paths["max"])
        stats.min = np.load(paths["min"])
    return stats


def standardize(dataset: np.ndarray, stats: NormStats, normalize: bool = False):
    """Apply the reference's standardize/Normalize transform
    (H36_dataset.py:261-283), vectorized over frames.

    2D + normalize: x -> 2x - 1. 3D + normalize: map through min/max to [0,1]
    then shift by -0.5. Otherwise: (x - mean) / std.
    """
    dim = dataset.shape[-1]
    if normalize:
        if dim == 2:
            return 2.0 * dataset - 1.0
        out = (dataset - stats.min) / (stats.max - stats.min)
        return out - 0.5
    return ((dataset - stats.mean) / stats.std).astype(dataset.dtype)


def destandardize(dataset, stats: NormStats, normalize: bool = False):
    """Inverse of :func:`standardize` (semantics of train_5.py:32-49)."""
    dim = dataset.shape[-1]
    if normalize:
        if dim == 2:
            return (dataset + 1.0) / 2.0
        return (dataset + 0.5) * (stats.max - stats.min) + stats.min
    import jax.numpy as jnp

    if isinstance(dataset, np.ndarray):
        return dataset * stats.std + stats.mean
    return dataset * jnp.asarray(stats.std, dataset.dtype) + jnp.asarray(
        stats.mean, dataset.dtype
    )
