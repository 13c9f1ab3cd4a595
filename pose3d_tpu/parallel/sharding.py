"""Parameter sharding rules (tensor parallelism via GSPMD annotations).

The lifter weights are small enough to replicate, but the framework supports
sharding the wide (1024-wide Martinez, 4x-MLP transformer) layers over the
``model`` mesh axis: annotate each large kernel's output feature axis and let
XLA insert the all-gathers/reduce-scatters (scaling-book recipe — we never
write collectives by hand for the model path).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pose3d_tpu.parallel.mesh import MODEL_AXIS


def infer_param_sharding(params, mesh: Mesh, min_dim: int = 256):
    """NamedSharding tree: shard the last axis of any param whose trailing
    dim is large and divisible by the model-axis size; replicate the rest."""
    tp = mesh.shape[MODEL_AXIS]

    def rule(x):
        if (
            tp > 1
            and hasattr(x, "ndim")
            and x.ndim >= 1
            and x.shape[-1] >= min_dim
            and x.shape[-1] % tp == 0
        ):
            spec = [None] * (x.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(params, mesh: Mesh, min_dim: int = 256):
    shardings = infer_param_sharding(params, mesh, min_dim)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
