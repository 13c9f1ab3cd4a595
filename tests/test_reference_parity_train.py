"""Train-STEP numerical parity vs the ACTUAL reference torch trainers
(VERDICT round 2, item 1a).

Round 2 proved *forward* parity by weight transplant; these tests close the
remaining half of the "MPJPE parity" claim: one IDENTICAL batch runs through
the reference's torch train step — MSE -> backward -> AdamW/Adam with
torch-default hyperparameters (phase1_lifting/train_1.py:94-96 with the
bare ``AdamW(lr=lr)`` of train_1.py:39; phase3_direct/my_HybrIK/
train_3.py:80-83 with ``Adam(lr, weight_decay=1e-8)``) — and through this
framework's jitted TrainState step, and the tests assert:

- GRADIENTS agree (mapped through the same state-dict converters),
- POST-STEP PARAMETERS agree (optimizer semantics: AdamW's decoupled 1e-2
  default decay, Adam's coupled 1e-8 decay, bias correction, eps placement),
- BATCHNORM RUNNING STATS agree (momentum 0.1; torch's unbiased
  running-variance update vs biased batch normalization — the split
  pose3d_tpu.models.norm.BatchNorm reproduces).

Method: everything runs in FLOAT64 on both sides (torch ``.double()``, jax
with x64 enabled for this module). In f64 the two steps compute the same
mathematical function to ~1e-10; the f32 production configuration then
differs from the reference only by rounding, not by math. (The learning
rate is 2^-10 so the f32 plateau-state lr is exactly representable and
contributes no rounding term of its own.)

The plateau-LR trigger (factor .7 / patience 3 / cooldown 2 / min 5e-6,
train_1.py:41) is proven equivalent against the actual torch
ReduceLROnPlateau in tests/test_schedule.py; multi-epoch MPJPE curve parity
on identical fabricated data is in tests/test_reference_curve_parity.py.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_reference_parity import (  # noqa: E402
    PHASE1,
    PHASE3,
    randomize_bn_stats,
    ref_module,
)

from pose3d_tpu import losses  # noqa: E402
from pose3d_tpu.interop import (  # noqa: E402
    martinez_from_torch,
    posenet3d_from_torch,
    vit_lifter_from_torch,
)
from pose3d_tpu.models.heads import PoseNet3D  # noqa: E402
from pose3d_tpu.models.lifters import (  # noqa: E402
    JointTransformerLifter,
    MartinezLifter,
)
from pose3d_tpu.train.image_steps import make_direct_train_step  # noqa: E402
from pose3d_tpu.train.schedule import plateau_init  # noqa: E402
from pose3d_tpu.train.state import TrainState, make_optimizer  # noqa: E402
from pose3d_tpu.train.steps import make_lifter_train_step  # noqa: E402

pytestmark = pytest.mark.skipif(
    not PHASE1.exists(), reason="reference checkout not present"
)

LR = 2.0 ** -10  # exactly representable in f32 and f64


@pytest.fixture(scope="module", autouse=True)
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def to_f64(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), tree
    )


def torch_sd(model):
    return {k: v.detach().clone() for k, v in model.state_dict().items()}


def torch_grads(model):
    return {k: p.grad.detach().clone()
            for k, p in model.named_parameters() if p.grad is not None}


def assert_tree_close(ours, want, atol, label=""):
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    flat_w = jax.tree_util.tree_leaves(want)
    assert len(flat_o) == len(flat_w), (
        f"{label}: {len(flat_o)} leaves vs {len(flat_w)}"
    )
    for (path, xo), xw in zip(flat_o, flat_w):
        np.testing.assert_allclose(
            np.asarray(xo, np.float64), np.asarray(xw, np.float64),
            atol=atol, rtol=0,
            err_msg=f"{label}{jax.tree_util.keystr(path)}",
        )


def lifter_state(model, params, batch_stats=None, *, kind="adamw",
                 weight_decay=None):
    tx = make_optimizer(LR, kind, weight_decay=weight_decay)
    return TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        batch_stats=batch_stats or {}, opt_state=tx.init(params),
        plateau=plateau_init(LR), tx=tx, apply_fn=model.apply,
    )


def run_torch_step(tmodel, opt, x, y):
    """The reference loop body verbatim (train_1.py:94-96 / train_3.py:80-83):
    zero_grad -> forward -> MSE -> backward -> step. Returns
    (loss, grads dict). The model decides its own output handling."""
    opt.zero_grad()
    pred = tmodel(torch.from_numpy(x))
    if isinstance(pred, tuple):  # Model_3D returns (coords, heatmap)
        pred = pred[0]
    pred = pred.reshape(*y.shape)
    loss = torch.nn.MSELoss(reduction="mean")(pred, torch.from_numpy(y))
    loss.backward()
    g = torch_grads(tmodel)
    opt.step()
    return float(loss), g


# ---------------------------------------------------------------- phase 1


class TestPhase1LifterTrainStep:
    def test_vit_adamw_one_step_parity(self, monkeypatch):
        """MyViT + torch.optim.AdamW(lr) — the committed phase-1 trainer
        (train_1.py:35,39). AdamW's torch-default decoupled weight decay is
        1e-2; optax.adamw defaults to 1e-4 — make_optimizer pins the torch
        value, and this test would catch a regression."""
        bm = ref_module("baselineModel", PHASE1)
        torch.manual_seed(10)
        tm = bm.MyViT(chw=(1, 17, 2), out_d=3).double()
        tm.train()

        rng = np.random.default_rng(10)
        x = rng.standard_normal((16, 17, 2))
        y = rng.standard_normal((16, 17, 3)) * 0.5

        sd0 = torch_sd(tm)
        opt = torch.optim.AdamW(tm.parameters(), lr=LR)  # wd default 1e-2
        loss_t, grads_t = run_torch_step(tm, opt, x, y)
        sd1 = torch_sd(tm)

        # Bit-align the fixed sinusoidal PE with the reference BUFFER: the
        # formula is reproduced exactly, but the reference materializes the
        # table in f32 (baselineModel.py:329) and one-ulp sin/cos rounding
        # differences would otherwise dominate an f64 comparison.
        import pose3d_tpu.models.lifters as lifters_mod

        pe = tm.pos_embed.detach().numpy().reshape(17, 256)
        monkeypatch.setattr(
            lifters_mod, "sinusoidal_positional_embeddings",
            lambda s, d: pe,
        )

        model = JointTransformerLifter(dtype=jnp.float64)
        params = to_f64(vit_lifter_from_torch(sd0)["params"])

        def loss_fn(p):
            out = model.apply({"params": p}, jnp.asarray(x), train=True)
            return losses.mse(out.reshape(y.shape), jnp.asarray(y))

        loss_j, grads_j = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert abs(float(loss_j) - loss_t) < 1e-12 + 1e-12 * abs(loss_t)
        want_g = vit_lifter_from_torch(grads_t)["params"]
        assert_tree_close(grads_j, want_g, atol=1e-11, label="grads")

        state = lifter_state(model, params)
        step = make_lifter_train_step("mse", donate=False)
        new_state, metrics = step(
            state, jnp.asarray(x), jnp.asarray(y), jax.random.key(0)
        )
        # Adam's update g/(sqrt(v)+eps) has sensitivity ~1/eps near g=0,
        # amplifying f64 reduction-order noise to ~1e-11 on a few leaves
        want_p = vit_lifter_from_torch(sd1)["params"]
        assert_tree_close(new_state.params, want_p, atol=1e-10,
                          label="post-step params")
        assert abs(float(metrics["loss"]) - loss_t) < 1e-12 + 1e-12 * abs(loss_t)

    def test_martinez_adamw_one_step_parity_with_bn_stats(self):
        """LinearModel (the phase-1 alternative lifter, train_1.py:33) with
        BatchNorm active in train mode: proves the running-stat update —
        torch momentum 0.1 with UNBIASED batch variance (n/(n-1)) while the
        batch itself is normalized by the biased variance — and the AdamW
        step on a BN-carrying model. Dropout is pinned to 0 on both sides
        (dropout masks are framework-RNG-specific; scaling semantics are
        identical inverted dropout)."""
        bm = ref_module("baselineModel", PHASE1)
        torch.manual_seed(11)
        tm = bm.LinearModel(i_dim=34, o_dim=51, p_dropout=0.0)
        randomize_bn_stats(tm, seed=11)
        tm = tm.double()
        tm.train()

        rng = np.random.default_rng(11)
        B = 32  # Bessel factor 32/31: a biased-update regression would fail
        x = rng.standard_normal((B, 17, 2))
        y = rng.standard_normal((B, 17, 3)) * 0.5

        sd0 = torch_sd(tm)
        opt = torch.optim.AdamW(tm.parameters(), lr=LR)
        loss_t, grads_t = run_torch_step(tm, opt, x, y)
        sd1 = torch_sd(tm)

        model = MartinezLifter(dropout=0.0, dtype=jnp.float64)
        variables = to_f64(martinez_from_torch(sd0))
        params, stats = variables["params"], variables["batch_stats"]

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": stats}, jnp.asarray(x),
                train=True, mutable=["batch_stats"],
            )
            return (losses.mse(out.reshape(y.shape), jnp.asarray(y)),
                    upd["batch_stats"])

        (loss_j, new_bs), grads_j = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params)
        assert abs(float(loss_j) - loss_t) < 1e-12 + 1e-12 * abs(loss_t)

        # converter needs running stats present; grads only carry params
        gsd = {k: v for k, v in sd0.items() if "running" in k}
        gsd.update(grads_t)
        want_g = martinez_from_torch(gsd)["params"]
        assert_tree_close(grads_j, want_g, atol=1e-11, label="grads")

        state = lifter_state(model, params, stats)
        step = make_lifter_train_step("mse", donate=False)
        new_state, _ = step(
            state, jnp.asarray(x), jnp.asarray(y), jax.random.key(0)
        )
        want = martinez_from_torch(sd1)
        assert_tree_close(new_state.params, want["params"], atol=1e-10,
                          label="post-step params")
        assert_tree_close(new_state.batch_stats, want["batch_stats"],
                          atol=1e-12, label="post-step running stats")


# ---------------------------------------------------------------- phase 3


class TestPhase3DirectTrainStep:
    @pytest.mark.slow
    def test_model3d_adam_one_step_parity(self):
        """Model_3D + Adam(lr, weight_decay=1e-8) + MSE on soft-argmax
        coords — the phase-3 step (train_3.py:30-31,77-83). One f64 batch
        through both steps: gradients through ResNet50 + deconv + 64^3
        softmax + soft-argmax, the COUPLED 1e-8 weight decay (wd*p added to
        the gradient before the moment updates, unlike AdamW), and ~50
        BatchNorm2d running-stat updates (n = B*H*W Bessel correction)."""
        ref_model = ref_module("Model", PHASE3)
        torch.manual_seed(12)
        tm = ref_model.Model_3D()
        randomize_bn_stats(tm, seed=12)
        tm = tm.double()
        tm.train()

        rng = np.random.default_rng(12)
        # Model_3D hardcodes the 64^3 reshape (Model.py:146) => 256^2 input
        x_nchw = rng.random((2, 3, 256, 256))
        y = rng.standard_normal((2, 17, 3)) * 0.4

        sd0 = torch_sd(tm)
        opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=1e-8)
        opt.zero_grad()
        coords_t, _ = tm(torch.from_numpy(x_nchw), torch.zeros(2, 2).double())
        pred_t = coords_t.reshape(2, 17, 3)
        loss_torch = torch.nn.MSELoss(reduction="mean")(
            pred_t, torch.from_numpy(y)
        )
        loss_torch.backward()
        grads_t = torch_grads(tm)
        opt.step()
        sd1 = torch_sd(tm)
        loss_t = float(loss_torch)

        model = PoseNet3D(return_heatmap=False, use_pallas=False,
                          dtype=jnp.float64)
        x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        # init only provides the variable-tree template for the transplant:
        # run it on the cheap f32 model (identical structure)
        init = jax.jit(
            PoseNet3D(return_heatmap=False, use_pallas=False).init,
            static_argnames=("train",),
        )(jax.random.key(0), jnp.zeros((1, 256, 256, 3), jnp.float32),
          train=False)
        # f64 template: load_torch_resnet casts values to the template's
        # leaf dtype, and post-step torch values are not f32-representable
        init = to_f64(init)
        variables, _ = posenet3d_from_torch(init, sd0)
        variables = to_f64(variables)
        params, stats = variables["params"], variables["batch_stats"]

        # the dead camera-embedding MLP (Model.py:50-64) has params in the
        # torch model but receives no gradient and never moves — drop it
        # from the comparison trees
        def strip_dead(sd):
            return {k: v for k, v in sd.items()
                    if not k.startswith("embedding_layers")}

        def loss_fn(p):
            (coords, _), upd = model.apply(
                {"params": p, "batch_stats": stats}, x_nhwc,
                train=True, mutable=["batch_stats"],
            )
            return (losses.mse(coords.reshape(y.shape), jnp.asarray(y)),
                    upd["batch_stats"])

        (loss_j, new_bs), grads_j = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params)
        assert abs(float(loss_j) - loss_t) < 1e-10 + 1e-10 * abs(loss_t)

        gsd = {k: v for k, v in sd0.items() if "running" in k}
        gsd.update(strip_dead(grads_t))
        # conv-kernel grads accumulate over 2*256^2 positions in different
        # orders: f64 drift reaches ~1e-10 absolute on O(1e-3) entries
        want_g, _ = posenet3d_from_torch(init, gsd)
        assert_tree_close(grads_j, want_g["params"], atol=1e-9,
                          label="grads")

        tx = make_optimizer(LR, "adam", weight_decay=1e-8)
        state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            batch_stats=stats, opt_state=tx.init(params),
            plateau=plateau_init(LR), tx=tx, apply_fn=model.apply,
        )
        step = make_direct_train_step("mse", donate=False)
        new_state, metrics = step(state, x_nhwc, jnp.asarray(y),
                                  jax.random.key(0))
        want, _ = posenet3d_from_torch(init, strip_dead(sd1))
        assert_tree_close(new_state.params, want["params"], atol=3e-9,
                          label="post-step params")
        assert_tree_close(new_state.batch_stats, want["batch_stats"],
                          atol=1e-10, label="post-step running stats")
