"""Sharded checkpoint/resume on the virtual mesh (SURVEY.md section 5
failure-recovery row): orbax save of a TP-sharded TrainState (params AND
opt_state sharded over the model axis) must restore bit-equal WITH its
shardings intact, and training resumed from the restore must be bit-equal
to the uninterrupted run.

The reference has no distributed checkpointing at all (torch.save of a
single-GPU state dict, train_1.py:186); this is the recovery path a mesh
deployment actually exercises.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from pose3d_tpu.data import synthetic
from pose3d_tpu.models.lifters import MartinezLifter
from pose3d_tpu.parallel.mesh import MODEL_AXIS, batch_sharding, make_mesh, replicated
from pose3d_tpu.parallel.sharding import shard_params
from pose3d_tpu.train import checkpoint as ckpt
from pose3d_tpu.train.state import create_train_state
from pose3d_tpu.train.steps import make_lifter_train_step, plateau_step

B = 16


def _sharded_state(mesh):
    state = create_train_state(
        MartinezLifter(), jax.random.key(0), jnp.zeros((B, 17, 2)), lr=1e-3
    )
    state = jax.device_put(state, replicated(mesh))
    # TP-shard the wide kernels — and the optimizer moments that mirror
    # them (the rule is per-leaf, so Adam's mu/nu pick up the same spec
    # their param would; scalars like count stay replicated)
    return state.replace(
        params=shard_params(state.params, mesh),
        opt_state=shard_params(state.opt_state, mesh),
    )


def _tree_equal(a, b, msg):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for (path, xa), xb in zip(fa, fb):
        np.testing.assert_array_equal(
            np.asarray(xa), np.asarray(xb),
            err_msg=msg + jax.tree_util.keystr(path))


class TestShardedCheckpointResume:
    def test_tp_sharded_state_restores_bit_equal_and_resumes(
            self, devices, rng, tmp_path):
        mesh = make_mesh(n_data=4, n_model=2, devices=devices)
        state = _sharded_state(mesh)

        # the sharding rule must actually have sharded something, or the
        # test silently degrades to a replicated-restore check
        tp_specs = [
            s.spec for s in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x.sharding, state.params))
            if MODEL_AXIS in s.spec
        ]
        assert tp_specs, "no param picked up a TP sharding"

        kp2d, kp3d = synthetic.synthetic_h36m(B)
        kp3d = kp3d - kp3d[:, :1]
        y1 = jax.device_put(jnp.asarray(kp2d), batch_sharding(mesh))
        y2 = jax.device_put(jnp.asarray(kp3d), batch_sharding(mesh))
        step = make_lifter_train_step(loss="mse", donate=False)

        # one real step -> nontrivial opt_state/plateau, then checkpoint.
        # Re-pin the canonical shardings afterwards: the unconstrained jit
        # is free to propagate its own output layouts (observed: a
        # replicated kernel coming back P('model')), and the checkpoint
        # should hold the layout the trainer defines, not what one step's
        # partitioner chose.
        state, metrics = step(state, y1, y2, jax.random.key(1))
        state = plateau_step(state, metrics["loss"])
        state = state.replace(
            params=shard_params(state.params, mesh),
            opt_state=shard_params(state.opt_state, mesh),
        )
        ckpt.save(state, tmp_path, "mesh_run", batch_size=B)

        restored, meta = ckpt.restore(
            _sharded_state(mesh), tmp_path, "mesh_run")
        assert meta["batch_size"] == B

        # bit equality of every leaf: params, opt_state, step, plateau
        _tree_equal(restored.params, state.params, "params")
        _tree_equal(restored.opt_state, state.opt_state, "opt_state")
        assert int(restored.step) == int(state.step) == 1
        assert dataclasses.asdict(restored.plateau) == \
            dataclasses.asdict(state.plateau)

        # shardings survive the round-trip (restored directly onto the
        # mesh, not as replicated host arrays)
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(restored.params),
                jax.tree_util.tree_leaves(state.params)):
            assert isinstance(a.sharding, NamedSharding), path
            assert a.sharding.spec == b.sharding.spec, \
                jax.tree_util.keystr(path)
            assert a.sharding.mesh.shape == mesh.shape

        # resumed training == uninterrupted training, bit for bit
        cont, m1 = step(state, y1, y2, jax.random.key(2))
        res, m2 = step(restored, y1, y2, jax.random.key(2))
        assert float(m1["loss"]) == float(m2["loss"])
        _tree_equal(res.params, cont.params, "post-resume params")
        _tree_equal(res.opt_state, cont.opt_state, "post-resume opt_state")
