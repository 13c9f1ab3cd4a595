"""Checkpoint save/restore (orbax), reference-compatible run layout.

Replaces ``torch.save({'epoch','batch_size','model','optimizer'},
"./logs/models/"+run_name)`` (train_1.py:186, train_3.py:168, train_5.py:336)
with an orbax pytree checkpoint holding {step, params, batch_stats,
opt_state, plateau} plus run metadata. The ``logs/models/<run_name>`` path
convention is preserved so the cross-phase checkpoint-reuse workflow (phase5
loading the phase1 lifter, train_5.py:64-69) looks the same.

Failure recovery (SURVEY.md section 5): ``save`` is atomic (orbax writes to a
tmp dir then renames), and the trainers install a KeyboardInterrupt handler
that snapshots an ``interrupt_<run>`` checkpoint — the reference's CtlCSave
behavior (train_3.py:252-256).
"""

from __future__ import annotations

import dataclasses
import pathlib

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(log_dir, run_name: str) -> pathlib.Path:
    return (pathlib.Path(log_dir) / "models" / run_name).absolute()


def save(state, log_dir, run_name: str, *, batch_size: int | None = None,
         extra: dict | None = None) -> str:
    """Checkpoint a TrainState (or any pytree of arrays) atomically."""
    import json

    path = _ckpt_dir(log_dir, run_name)
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "plateau": dataclasses.asdict(state.plateau)
        if dataclasses.is_dataclass(state.plateau) else state.plateau,
    }
    with ocp.StandardCheckpointer() as ckptr:
        path.parent.mkdir(parents=True, exist_ok=True)
        ckptr.save(path, payload, force=True)
    # orbax array trees don't carry strings; run metadata goes in a sidecar
    meta = {"batch_size": batch_size or 0, **(extra or {})}
    with open(str(path) + ".meta.json", "w") as f:
        json.dump(meta, f)
    return str(path)


def _leaf_template(x):
    """Restore template leaf: mesh-sharded jax.Arrays become abstract
    ShapeDtypeStructs CARRYING their sharding, so orbax materializes each
    shard directly on its device (no replicated host round-trip and the
    resumed state keeps the exact TP/DP layout it was saved under);
    everything else restores as host numpy."""
    if isinstance(x, jax.Array) and isinstance(
            x.sharding, jax.sharding.NamedSharding):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    return np.asarray(x)


def restore(state, log_dir, run_name: str):
    """Restore into the shape (and sharding) of an existing TrainState.
    Returns (state, meta dict)."""
    import json

    from pose3d_tpu.train.schedule import PlateauState

    path = _ckpt_dir(log_dir, run_name)
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "plateau": dataclasses.asdict(state.plateau),
    }
    # orbax restores arrays matching the template's structure/dtypes, onto
    # the template's shardings where the live state is mesh-sharded
    template = jax.tree_util.tree_map(_leaf_template, template)
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(path, template)
    state = state.replace(
        step=payload["step"],
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(payload["opt_state"]),
        ),
        plateau=PlateauState(**payload["plateau"]),
    )
    meta = {}
    meta_path = str(path) + ".meta.json"
    if pathlib.Path(meta_path).exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def peek_params(log_dir, run_name: str):
    """Load ONLY the ``params`` subtree of a checkpoint whose architecture
    is unknown: the tree structure/shapes come from the checkpoint's
    metadata (no array reads), then a partial restore materializes just the
    params — inference tooling (cli.predict) adapts to whatever
    architecture the checkpoint was trained with without paying the
    opt_state's memory/load cost."""
    path = _ckpt_dir(log_dir, run_name)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        meta_tree = ckptr.metadata(path).item_metadata.tree["params"]
        template = {
            "params": jax.tree_util.tree_map(
                lambda m: np.zeros(m.shape, m.dtype), meta_tree
            )
        }
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.RestoreArgs(restore_type=np.ndarray), template
        )
        payload = ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                template, restore_args=restore_args, partial_restore=True
            ),
        )
    return payload["params"]


def restore_params(log_dir, run_name: str, params_template,
                   batch_stats_template=None):
    """Load only model params (+ batch stats): cross-model checkpoint reuse
    (the phase5 pattern of loading a frozen phase1 lifter, train_5.py:64-69)
    and inference-time restore that must not depend on the optimizer layout.
    Returns params (or (params, batch_stats) when a stats template is given).
    """
    path = _ckpt_dir(log_dir, run_name)
    template = {"params": jax.tree_util.tree_map(np.asarray, params_template)}
    if batch_stats_template is not None:
        template["batch_stats"] = jax.tree_util.tree_map(
            np.asarray, batch_stats_template
        )
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.RestoreArgs(restore_type=np.ndarray), template
        )
        payload = ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                template, restore_args=restore_args, partial_restore=True
            ),
        )
    if batch_stats_template is not None:
        return payload["params"], payload["batch_stats"]
    return payload["params"]


def load_meta(log_dir, run_name: str) -> dict:
    """Read the .meta.json sidecar ({} when absent) — run metadata that
    array trees can't carry (batch_size, and non-shape-derivable
    architecture fields like the temporal lifter's head count)."""
    import json

    meta_path = str(_ckpt_dir(log_dir, run_name)) + ".meta.json"
    if not pathlib.Path(meta_path).exists():
        return {}
    with open(meta_path) as f:
        return json.load(f)


def exists(log_dir, run_name: str) -> bool:
    return _ckpt_dir(log_dir, run_name).exists()
