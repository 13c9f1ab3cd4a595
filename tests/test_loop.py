"""Phase-5 consistency-loop step: joint training, freezing, flip averaging."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.data import synthetic
from pose3d_tpu.models.heads import PoseNet2D, PoseNet3D
from pose3d_tpu.models.lifters import JointTransformerLifter
from pose3d_tpu.train.loop_steps import (
    LoopState,
    loop_plateau_step,
    make_loop_eval_step,
    make_loop_train_step,
)
from pose3d_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def setup():
    img = jnp.zeros((2, 32, 32, 3))
    model2d = PoseNet2D(architecture="resnet18")
    model3d = PoseNet3D(architecture="resnet18", depth=8, return_heatmap=True)
    lifter = JointTransformerLifter(hidden=64, n_blocks=1, heads=2)
    projector = JointTransformerLifter(in_dim=3, out_dim=2, hidden=64,
                                       n_blocks=1, heads=2)
    state = LoopState(
        net2d=create_train_state(model2d, jax.random.key(0), img, lr=5e-4),
        net3d=create_train_state(model3d, jax.random.key(1), img, lr=5e-4),
        lifter_params=lifter.init(
            {"params": jax.random.key(2)}, jnp.zeros((2, 17, 2)), train=False
        )["params"],
        projector_params=projector.init(
            {"params": jax.random.key(3)}, jnp.zeros((2, 17, 3)), train=False
        )["params"],
    )
    kp2d, kp3d = synthetic.synthetic_h36m(8)
    kp3d = kp3d - kp3d[:, :1]
    frames = synthetic.synthetic_frames(8, 32)
    return state, lifter, projector, jnp.asarray(frames), jnp.asarray(kp2d), jnp.asarray(kp3d)


class TestLoopStep:
    def test_plain_joint_step(self, setup):
        state, lifter, projector, frames, kp2d, kp3d = setup
        step = make_loop_train_step(donate=False)
        new_state, m = step(state, frames, kp2d, kp3d, jax.random.key(0))
        assert np.isfinite(float(m["loss"]))
        assert set(m) >= {"loss", "loss_2d", "loss_3d", "mpjpe_sums"}
        # both trained models' params moved
        d2 = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.net2d.params, new_state.net2d.params)
        assert max(jax.tree_util.tree_leaves(d2)) > 0
        d3 = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.net3d.params, new_state.net3d.params)
        assert max(jax.tree_util.tree_leaves(d3)) > 0

    @pytest.mark.slow

    def test_triangle_flip_project_step(self, setup):
        state, lifter, projector, frames, kp2d, kp3d = setup
        step = make_loop_train_step(
            lifter.apply, projector.apply, triangle=True, flip=True,
            project=True, donate=False,
        )
        new_state, m = step(state, frames, kp2d, kp3d, jax.random.key(0))
        for k in ("loss_2d", "loss_3d", "loss_lift", "loss_domain_gap",
                  "loss_proj", "loss_gap_proj"):
            assert k in m and np.isfinite(float(m[k])), k
        # frozen submodels untouched by construction
        same = jax.tree_util.tree_map(
            lambda a, b: bool((a == b).all()),
            state.lifter_params, new_state.lifter_params)
        assert all(jax.tree_util.tree_leaves(same))

    def test_triangle_cycle_mode(self, setup):
        """The unsupervised cycle variant (reference TriangleLoss,
        phase5_loop/losses.py:10-62): lift term couples the predictions,
        no domain-gap terms; loss decreases over a few steps."""
        state, lifter, projector, frames, kp2d, kp3d = setup
        step = make_loop_train_step(
            lifter.apply, projector.apply, triangle=True, project=True,
            triangle_mode="cycle", donate=False,
        )
        s, m0 = step(state, frames, kp2d, kp3d, jax.random.key(0))
        # cycle-mode term set: lift couples predictions; NO gap terms
        assert {"loss_2d", "loss_3d", "loss_lift", "loss_proj"} <= set(m0)
        assert "loss_domain_gap" not in m0 and "loss_gap_proj" not in m0
        losses = [float(m0["loss"])]
        for i in range(1, 6):
            s, m = step(s, frames, kp2d, kp3d, jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses

    def test_triangle_mode_validation(self):
        with pytest.raises(ValueError):
            make_loop_train_step(triangle_mode="nope")

    def test_eval_step_flip(self, setup):
        state, _, _, frames, kp2d, kp3d = setup
        ev = make_loop_eval_step(flip=True)
        m = ev(state, frames, kp2d, kp3d)
        assert np.isfinite(float(m["loss"]))
        assert m["mpjpe_sums"].shape == (17,)

    def test_per_model_plateau(self, setup):
        state, *_ = setup
        s = state
        for _ in range(6):
            s = loop_plateau_step(s, jnp.asarray(1.0))
        np.testing.assert_allclose(float(s.net2d.plateau.lr), 5e-4 * 0.7,
                                   rtol=1e-5)
        np.testing.assert_allclose(float(s.net3d.plateau.lr), 5e-4 * 0.7,
                                   rtol=1e-5)
