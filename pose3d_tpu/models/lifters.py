"""2D->3D keypoint lifting models.

TPU-native equivalents of the reference lifter zoo
(phase1_lifting/baselineModel.py):

- :class:`MartinezLifter`  <- ``LinearModel`` (baselineModel.py:50-102):
  Martinez-style residual MLP — Flatten -> Dense(1024) -> BN -> ReLU ->
  Dropout -> ``num_stage`` x residual block -> Dense(out).
- :class:`MartinezBlock`   <- ``Linear`` (baselineModel.py:14-47).
- :class:`AELifter`        <- ``AE`` (baselineModel.py:135-215): the active
  path is encoder2/decoder2 (1024-wide BN MLP); Tanh on 2D outputs.
- :class:`JointTransformerLifter` <- ``MyViT`` (baselineModel.py:312-362):
  17 joint tokens -> Dense to hidden 256 -> fixed (non-trainable) sinusoidal
  positional embedding -> 2 pre-LN transformer blocks (4 heads) -> per-token
  MLP 256 -> 128 -> out_d. The phase5 projector reuses it with
  ``in_dim=3, out_dim=2`` (train_5.py:63).

Behavioral notes kept for parity:
- the reference's Attention module (baselineModel.py:228-253, from lucidrains
  simple_vit) applies its own LayerNorm *in addition to* the block's pre-LN
  (baselineModel.py:308) — the double normalization is reproduced since it is
  what the trained reference computes;
- positional embeddings use the reference's exact sin/cos formula
  (baselineModel.py:220-225) and are not trained (baselineModel.py:329-330).

TPU-first design: all dims (1024, 256) are MXU-tile aligned; compute dtype is
configurable (bfloat16 for throughput, float32 params); BatchNorm under
data-parallel jit sees the full logical batch, so cross-replica statistics
come for free from GSPMD (SURVEY.md section 2.7).
"""

from __future__ import annotations

import flax.linen as nn

from pose3d_tpu.models.norm import BatchNorm
import jax.numpy as jnp
import numpy as np


def sinusoidal_positional_embeddings(sequence_length: int, d: int) -> np.ndarray:
    """Fixed PE with the reference's formula (baselineModel.py:220-225):
    pe[i, j] = sin(i / 1e4^(j/d)) for even j, cos(i / 1e4^((j-1)/d)) for odd j.
    """
    i = np.arange(sequence_length)[:, None].astype(np.float64)
    j = np.arange(d)[None, :].astype(np.float64)
    angle_even = i / np.power(1e4, j / d)
    angle_odd = i / np.power(1e4, (j - 1) / d)
    pe = np.where(j % 2 == 0, np.sin(angle_even), np.cos(angle_odd))
    return pe.astype(np.float32)


class MartinezBlock(nn.Module):
    """Residual block: 2x (Dense -> BN -> ReLU -> Dropout) + skip."""

    size: int = 1024
    dropout: float = 0.5
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        y = x
        for _ in range(2):
            y = nn.Dense(self.size, dtype=self.dtype)(y)
            if self.use_bn:
                y = BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype,
                )(y)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class MartinezLifter(nn.Module):
    """Martinez-style residual-MLP lifter (reference ``LinearModel``)."""

    in_dim: int = 34           # 17 joints x 2
    out_dim: int = 51          # 17 joints x 3
    hidden: int = 1024
    num_stages: int = 2
    dropout: float = 0.5
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, 17, 2) or (B, in_dim). Returns (B, out_dim)."""
        y = x.reshape(x.shape[0], -1).astype(self.dtype)
        y = nn.Dense(self.hidden, dtype=self.dtype)(y)
        if self.use_bn:
            y = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        for _ in range(self.num_stages):
            y = MartinezBlock(
                self.hidden, self.dropout, self.use_bn, dtype=self.dtype
            )(y, train=train)
        y = nn.Dense(self.out_dim, dtype=self.dtype)(y)
        return y.astype(jnp.promote_types(self.dtype, jnp.float32))


class AELifter(nn.Module):
    """Autoencoder lifter — the reference ``AE``'s active encoder2/decoder2
    path (baselineModel.py:186-215): Flatten -> [Dense(1024) BN ReLU Drop]x2
    -> Dense(1024) BN ReLU Drop -> Dense(out).

    Latent reference bug, documented not reproduced: the final Tanh
    (baselineModel.py:208,213-214) is DEAD CODE — the guard compares
    ``self.output_dim == 2`` after ``output_dim *= n_joints`` (34 != 2), so
    no trained reference AE ever applies it. Proven by the weight-transplant
    parity test (tests/test_reference_parity.py::test_ae_2d_output_no_tanh).
    """

    in_dim: int = 34
    out_dim: int = 51
    hidden: int = 1024
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = x.reshape(x.shape[0], -1).astype(self.dtype)
        for _ in range(3):  # encoder2 has 2 blocks, decoder2 one more
            y = nn.Dense(self.hidden, dtype=self.dtype)(y)
            y = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(y)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.out_dim, dtype=self.dtype)(y)
        return y.astype(jnp.promote_types(self.dtype, jnp.float32))


class JointAttention(nn.Module):
    """Multi-head self-attention over joint tokens (baselineModel.py:228-253).

    Includes the module-local LayerNorm of the reference (lucidrains
    simple_vit style); qkv and output projections have no bias.

    All LayerNorms in this file use epsilon=1e-5 — the torch default the
    reference inherits (flax defaults to 1e-6; the mismatch was a real
    ~1e-6-relative forward divergence, caught by the f64 train-step parity
    tests in tests/test_reference_parity_train.py).
    """

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_head = self.dim // self.heads
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, N, H*D) -> (B, H, N, D)
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (dim_head ** -0.5)
        acc = jnp.promote_types(self.dtype, jnp.float32)
        attn = nn.softmax(attn.astype(acc), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(out)


class TransformerBlock(nn.Module):
    """Pre-LN block (baselineModel.py:291-310): x + MHSA(LN(x));
    x + MLP(LN(x)) with GELU, mlp_ratio=4."""

    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + JointAttention(self.dim, self.heads, dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        )
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class JointTransformerLifter(nn.Module):
    """Joint-token transformer lifter (reference ``MyViT``).

    (B, n_joints, in_dim) -> (B, n_joints, out_dim). Defaults mirror
    baselineModel.py:313: 17 tokens, 2 blocks, hidden 256, 4 heads, out 3.
    """

    n_joints: int = 17
    in_dim: int = 2
    out_dim: int = 3
    hidden: int = 256
    n_blocks: int = 2
    heads: int = 4
    class_token: bool = False  # two2three.py:314-384 variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        del train  # no dropout/BN in the reference transformer path
        x = x.astype(self.dtype)
        tokens = nn.Dense(self.hidden, dtype=self.dtype)(x)
        seq = self.n_joints + (1 if self.class_token else 0)
        if self.class_token:
            cls = self.param("cls_token", nn.initializers.normal(0.02),
                             (1, 1, self.hidden))
            cls = jnp.broadcast_to(
                cls.astype(self.dtype), (x.shape[0], 1, self.hidden)
            )
            tokens = jnp.concatenate([cls, tokens], axis=1)
        pe = sinusoidal_positional_embeddings(seq, self.hidden)
        tokens = tokens + jnp.asarray(pe, dtype=self.dtype)
        for _ in range(self.n_blocks):
            tokens = TransformerBlock(self.hidden, self.heads, dtype=self.dtype)(tokens)
        if self.class_token:
            tokens = tokens[:, 1:]
        y = nn.Dense(self.hidden // 2, dtype=self.dtype)(tokens)
        y = nn.relu(y)
        y = nn.Dense(self.out_dim, dtype=self.dtype)(y)
        return y.astype(jnp.promote_types(self.dtype, jnp.float32))
