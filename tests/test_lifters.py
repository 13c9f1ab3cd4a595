"""Lifter model zoo: shapes, parameter structure, equivariance properties."""

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.models.lifters import (
    AELifter,
    JointTransformerLifter,
    MartinezLifter,
    sinusoidal_positional_embeddings,
)


def _init_and_apply(model, x, train=False):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=True
    )
    kwargs = dict(train=train)
    if train:
        out = model.apply(
            variables, x, rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"] if "batch_stats" in variables else [],
            **kwargs,
        )
        return out[0] if isinstance(out, tuple) else out, variables
    return model.apply(variables, x, **kwargs), variables


class TestMartinez:
    def test_output_shape(self):
        x = jnp.zeros((8, 17, 2))
        out, variables = _init_and_apply(MartinezLifter(), x)
        assert out.shape == (8, 51)

    def test_param_structure(self):
        """w1(34->1024), 2 stages x 2 dense(1024), w2(1024->51) — the
        reference LinearModel's layer inventory (baselineModel.py:50-102)."""
        x = jnp.zeros((2, 17, 2))
        _, variables = _init_and_apply(MartinezLifter(), x)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
        # torch count: 34*1024+1024 + 4*(1024*1024+1024) + 1024*51+51
        # + BN affine params: (1+4)* 2*1024
        expected = (34 * 1024 + 1024) + 4 * (1024 * 1024 + 1024) + (1024 * 51 + 51) \
            + 5 * 2 * 1024
        assert n_params == expected

    def test_train_mode_runs_with_dropout(self):
        x = jnp.ones((4, 17, 2))
        out, _ = _init_and_apply(MartinezLifter(), x, train=True)
        assert out.shape == (4, 51)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_batch_stats_update(self):
        x = jnp.ones((4, 34))
        model = MartinezLifter()
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=True
        )
        _, updates = model.apply(
            variables, x, train=True, rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"],
        )
        assert "batch_stats" in updates


class TestJointTransformer:
    def test_output_shape(self):
        x = jnp.zeros((8, 17, 2))
        out, _ = _init_and_apply(JointTransformerLifter(), x)
        assert out.shape == (8, 17, 3)

    def test_projector_config(self):
        """phase5 reuses MyViT with in 3 / out 2 (train_5.py:63)."""
        x = jnp.zeros((4, 17, 3))
        out, _ = _init_and_apply(
            JointTransformerLifter(in_dim=3, out_dim=2), x
        )
        assert out.shape == (4, 17, 2)

    def test_positional_embedding_formula(self):
        """Reference formula (baselineModel.py:220-225) at spot points."""
        pe = sinusoidal_positional_embeddings(17, 256)
        assert pe.shape == (17, 256)
        np.testing.assert_allclose(pe[0, 0], np.sin(0.0), atol=1e-7)
        np.testing.assert_allclose(pe[0, 1], np.cos(0.0), atol=1e-7)
        i, j, d = 5, 10, 256
        np.testing.assert_allclose(
            pe[i, j], np.sin(i / (1e4 ** (j / d))), rtol=1e-5
        )
        np.testing.assert_allclose(
            pe[i, j + 1], np.cos(i / (1e4 ** (j / d))), rtol=1e-5
        )

    def test_permutation_sensitivity(self):
        """PE breaks joint-permutation equivariance — outputs must differ when
        tokens are shuffled (i.e. PE is actually applied)."""
        x = jax.random.normal(jax.random.key(0), (2, 17, 2))
        model = JointTransformerLifter()
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(variables, x, train=False)
        perm = np.roll(np.arange(17), 1)
        out_p = model.apply(variables, x[:, perm], train=False)
        assert not np.allclose(out[:, perm], out_p, atol=1e-4)


class TestAE:
    def test_output_shape(self):
        x = jnp.zeros((4, 17, 2))
        out, _ = _init_and_apply(AELifter(), x)
        assert out.shape == (4, 51)
        # NO tanh on any output config: the reference's final Tanh
        # (baselineModel.py:213-214) is dead code — it compares the
        # already-multiplied output_dim (34) against 2. Verified against the
        # real module in test_reference_parity.py.
        out2, _ = _init_and_apply(
            AELifter(in_dim=51, out_dim=34), jnp.ones((4, 17, 3))
        )
        assert out2.shape == (4, 34)
