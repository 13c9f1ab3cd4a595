"""Parity of the packed-attention Pallas kernels vs the XLA formulation.

Covers both kernels (small-seq packed / per-sequence), the custom_vjp
backward (must equal XLA grads exactly — it IS the XLA recompute), the
temporal model's use_pallas flag (same outputs, same param tree), and
cross-sequence isolation of the block-diagonal mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.ops.pallas_attention import (
    _rows_per_cell,
    _xla_attention_flat,
    packed_flat_attention,
    seq_attention,
)


class TestPackedFlatAttention:
    @pytest.mark.parametrize("seq,heads,n", [(17, 4, 64), (17, 8, 32),
                                             (16, 4, 32)])
    def test_matches_xla(self, seq, heads, n):
        rng = np.random.default_rng(0)
        dim = 256
        qkv = jnp.asarray(
            rng.standard_normal((n * seq, 3 * dim)).astype(np.float32))
        want = _xla_attention_flat(qkv, seq, heads)
        got = packed_flat_attention(qkv, seq, heads, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_rows_per_cell(self):
        assert _rows_per_cell(17) == 544  # 32 seqs
        assert _rows_per_cell(16) == 512  # 32 seqs
        assert _rows_per_cell(8) == 512

    def test_partial_cell_padded(self):
        # 3 sequences of 17 don't fill a 544-row cell -> the kernel zero-
        # pads to a whole cell (padded rows are isolated sequences under the
        # mask) and slices the result; must equal XLA exactly
        rng = np.random.default_rng(1)
        qkv = jnp.asarray(
            rng.standard_normal((3 * 17, 3 * 64)).astype(np.float32))
        want = _xla_attention_flat(qkv, 17, 4)
        got = packed_flat_attention(qkv, 17, 4, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_sequence_isolation(self):
        """Block-diagonal mask: perturbing sequence 0 leaves every other
        sequence's output bit-identical."""
        rng = np.random.default_rng(2)
        qkv = jnp.asarray(
            rng.standard_normal((32 * 17, 3 * 256)).astype(np.float32))
        base = packed_flat_attention(qkv, 17, 4, True)
        pert = packed_flat_attention(qkv.at[:17].add(1.0), 17, 4, True)
        np.testing.assert_array_equal(np.asarray(base[17:]),
                                      np.asarray(pert[17:]))

    def test_grad_equals_xla(self):
        rng = np.random.default_rng(3)
        qkv = jnp.asarray(
            rng.standard_normal((32 * 17, 3 * 128)).astype(np.float32))
        tgt = jnp.asarray(
            rng.standard_normal((32 * 17, 128)).astype(np.float32))

        def loss_kernel(x):
            return jnp.sum((packed_flat_attention(x, 17, 4, True) - tgt) ** 2)

        def loss_xla(x):
            return jnp.sum((_xla_attention_flat(x, 17, 4) - tgt) ** 2)

        g1 = jax.grad(loss_kernel)(qkv)
        g2 = jax.grad(loss_xla)(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


class TestFrameChunkedAttention:
    """frame_chunked_attention must equal the single full-width masked
    product for every chunk alignment, including the fallback paths."""

    @pytest.mark.parametrize("rows,chunk", [
        (272, 136),   # clean split (2 chunks of 8 frames)
        (544, 136),   # 4 chunks
        (272, 272),   # chunk == rows -> fallback
        (272, 100),   # rows % chunk != 0 -> fallback
        (272, 50),    # chunk % seq != 0 -> fallback
    ])
    def test_equals_masked_full_width(self, rows, chunk):
        from pose3d_tpu.ops.pallas_attention import (
            block_diag_mask,
            frame_chunked_attention,
            masked_heads_attention,
        )

        rng = np.random.default_rng(7)
        heads, dh = 8, 32
        qkv = jnp.asarray(rng.standard_normal(
            (rows, 3 * heads * dh)).astype(np.float32))
        want = masked_heads_attention(
            qkv, block_diag_mask(rows, 17), heads, dh)
        got = frame_chunked_attention(qkv, 17, heads, dh, chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_chunk_for(self):
        from pose3d_tpu.ops.pallas_attention import chunk_for

        assert chunk_for(17) == 136  # 8 frames
        assert chunk_for(16) == 128
        assert chunk_for(18) == 126 + 18 or chunk_for(18) % 18 == 0
        assert chunk_for(18) >= 128


class TestGroupedHeadsAttention:
    """The grouped-head formulation (g heads fused per matmul via
    block-diagonal expanded operands) must be EXACTLY the per-head math —
    f32 here, so parity is tight."""

    @pytest.mark.parametrize("seq,heads,dh,group,rows", [
        (17, 8, 32, 4, 136),    # spatial train chunk (2 groups of 4)
        (17, 8, 32, 2, 272),    # alternate grouping
        (17, 8, 32, 8, 136),    # all heads in one group
        (None, 8, 32, 4, 243),  # temporal: full attention over the clip
        (None, 4, 64, 2, 128),  # lifter serving shape (g*dh = 128)
    ])
    def test_forward_matches_per_head(self, seq, heads, dh, group, rows):
        from pose3d_tpu.ops.pallas_attention import (
            block_diag_mask,
            grouped_heads_attention,
            masked_heads_attention,
        )

        rng = np.random.default_rng(3)
        qkv = jnp.asarray(rng.standard_normal(
            (rows, 3 * heads * dh)).astype(np.float32))
        mask = None if seq is None else block_diag_mask(rows, seq)
        want = masked_heads_attention(qkv, mask, heads, dh)
        got = grouped_heads_attention(qkv, seq, heads, dh, group)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    @pytest.mark.parametrize("seq,heads,dh,group,rows", [
        (17, 8, 32, 4, 136),
        (None, 8, 32, 4, 243),
        (None, 4, 64, 2, 128),
    ])
    def test_backward_matches_autodiff(self, seq, heads, dh, group, rows):
        """grouped_attention_chunk_bwd vs jax.grad of the per-head
        forward — the hand algebra must be the true vjp."""
        from pose3d_tpu.ops.pallas_attention import (
            block_diag_mask,
            grouped_attention_chunk_bwd,
            masked_heads_attention,
        )

        rng = np.random.default_rng(4)
        qkv = jnp.asarray(rng.standard_normal(
            (rows, 3 * heads * dh)).astype(np.float32))
        g_out = jnp.asarray(rng.standard_normal(
            (rows, heads * dh)).astype(np.float32))
        mask = None if seq is None else block_diag_mask(rows, seq)

        def f(x):
            return jnp.vdot(masked_heads_attention(x, mask, heads, dh),
                            g_out)

        want = jax.grad(f)(qkv)
        got = grouped_attention_chunk_bwd(qkv, g_out, seq, heads, dh, group)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=1e-4)


class TestSeqAttention:
    def test_matches_xla(self):
        rng = np.random.default_rng(0)
        n, length, dim, heads = 6, 243, 128, 8
        qkv = jnp.asarray(
            rng.standard_normal((n, length, 3 * dim)).astype(np.float32))
        want = _xla_attention_flat(
            qkv.reshape(n * length, 3 * dim), length, heads
        ).reshape(n, length, dim)
        got = seq_attention(qkv, heads, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_grad_equals_xla(self):
        rng = np.random.default_rng(1)
        n, length, dim, heads = 2, 100, 64, 4
        qkv = jnp.asarray(
            rng.standard_normal((n, length, 3 * dim)).astype(np.float32))

        def loss_kernel(x):
            return jnp.sum(seq_attention(x, heads, True) ** 2)

        def loss_xla(x):
            flat = x.reshape(n * length, 3 * dim)
            return jnp.sum(_xla_attention_flat(flat, length, heads) ** 2)

        g1 = jax.grad(loss_kernel)(qkv)
        g2 = jax.grad(loss_xla)(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


class TestTemporalLifterFlag:
    def test_param_tree_and_output_invariant(self):
        """use_pallas must not change the param tree; on CPU (kernels
        inactive) outputs must be identical; the flat-row qkv restructure
        must keep outputs equal to the original formulation."""
        from pose3d_tpu.models.temporal import TemporalLifter

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 27, 17, 2)).astype(np.float32))
        m0 = TemporalLifter(clip_len=27, n_blocks=2)
        m1 = TemporalLifter(clip_len=27, n_blocks=2, use_pallas=True)
        p0 = m0.init({"params": jax.random.key(0)}, x)["params"]
        p1 = m1.init({"params": jax.random.key(0)}, x)["params"]
        assert jax.tree_util.tree_structure(p0) == \
            jax.tree_util.tree_structure(p1)
        y0 = m0.apply({"params": p0}, x)
        y1 = m1.apply({"params": p0}, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
