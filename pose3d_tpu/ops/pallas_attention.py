"""Pallas TPU kernels: multi-head self-attention for pose-token shapes.

Why: the temporal lifter's profile (ROUND2_NOTES, experiments/
temporal_profile.py) shows XLA attention running at <1% MXU on BOTH of its
shapes — seq 17 (joints within a frame: scores pad (17,17)->(32,128) tiles,
head-split transposes round-trip HBM) and seq 243 (frames per joint).
Attention is 66% of temporal inference time while being ~1% of its FLOPs.

Two kernels, both consuming the qkv projection in FLAT row layout (the
Dense that produces qkv runs on (rows, 3*dim) — unpadded — in XLA):

- ``packed_flat_attention``: small sequences. Rows (n_seqs*seq, 3*dim);
  a grid cell packs G sequences into (G*seq, dh) slabs per head and runs
  ONE masked (G*seq, G*seq) MXU matmul — the block-diagonal mask
  (row//seq == col//seq) makes the row softmax exactly per-sequence
  (same trick as ops/pallas_lifter, generalized over seq/heads).
- ``seq_attention``: long sequences, one sequence per grid cell via a
  (1, L, 3*dim) block; per-head (L, dh) matmuls in VMEM; Mosaic pads the
  block's trailing dims to tiles internally (L need not be tile-aligned).

Both are inference-fused and TRAINING-SAFE: a custom_vjp recomputes the
backward with the plain-XLA formulation (exactly like
ops/pallas_softargmax's legacy kernel) — forward gets the kernel, backward
costs what it did before.

Numerical contract: scores/softmax in f32, matmul accumulation f32,
activations bf16 (or the input dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_attention_flat(qkv, seq, heads):
    """Reference XLA formulation on flat rows (used for backward + CPU)."""
    rows, three_dim = qkv.shape
    dim = three_dim // 3
    dh = dim // heads
    n = rows // seq
    q, k, v = jnp.split(qkv.reshape(n, seq, 3 * dim), 3, axis=-1)

    def sh(t):
        return t.reshape(n, seq, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = sh(q), sh(k), sh(v)
    a = jnp.einsum("nhld,nhmd->nhlm", q, k) * (dh ** -0.5)
    a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    o = jnp.einsum("nhlm,nhmd->nhld", a, v)
    return o.transpose(0, 2, 1, 3).reshape(rows, dim)


def _rows_per_cell(seq: int) -> int:
    """Smallest multiple of ``seq`` that is >=512 and sublane-aligned (16)
    — M>=512 keeps the packed matmul MXU-efficient (4+ row tiles)."""
    g = 1
    while (g * seq) % 16 or g * seq < 512:
        g += 1
    return g * seq


def block_diag_mask(rows: int, seq: int):
    """(rows, rows) bool: True within each length-``seq`` diagonal block."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    return (r // seq) == (c // seq)


SCORE_CLAMP = 80.0  # overflow guard replacing the softmax row-max (see below)


def score_exp(s):
    """Clamped softmax numerator exp(min(s, SCORE_CLAMP)) on an f32 score
    tile — one named seam shared by every kernel's fwd/bwd so ablation
    probes (experiments/train_kernel_ablation.py) can patch the
    transcendental out and measure exactly what it costs."""
    return jnp.exp(jnp.minimum(s, SCORE_CLAMP))


def masked_heads_attention(qkv, mask, heads, dh):
    """Shared kernel-body helper: multi-head attention over packed rows.

    qkv (rows, 3*heads*dh), column layout [q | k | v] with head h of each
    at cols [h*dh, (h+1)*dh); mask (rows, rows) bool or None (full
    attention). Scores/softmax f32, matmul accumulation f32, output in
    qkv.dtype. Used inside the pallas_attention / pallas_lifter /
    pallas_stblock kernels — one implementation of the softmax math.
    """
    dim = heads * dh
    scale = dh ** -0.5
    outs = []
    for h in range(heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, dim + h * dh:dim + (h + 1) * dh]
        v = qkv[:, 2 * dim + h * dh:2 * dim + (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            s = jnp.where(mask, s, -jnp.inf)
        # Softmax without the row-max subtraction: the max is only an
        # overflow guard, and the cross-lane max-reduce + broadcast-sub on
        # the (rows, rows) f32 score tile is the single most expensive VPU
        # op in these kernels (measured: ~1/3 of the whole train-backward,
        # ROUND3_NOTES). A constant clamp at SCORE_CLAMP=80 is
        # mathematically IDENTICAL while every score is < 80 (trained nets
        # sit ~20; exp(80)=5.5e34 keeps e in bf16 range, and the widest
        # f32 row-sum any current kernel takes over these terms —
        # ATTN_CHUNK=136 in the lifter cells, TRAIN_ROWS=272 in the
        # stblock train kernels, 243 in seq_attention — stays well under
        # f32 max 3.4e38, including the unnormalized backward products in
        # ops/pallas_stblock_train); a
        # net whose scores exceed 80 has already diverged, and still gets
        # finite (saturated-uniform) outputs. exp(-inf)=0 keeps masked
        # entries exact. The normalization divide is folded into the
        # (rows, dh) attention output instead of the (rows, rows)
        # probability tile.
        e = score_exp(s)
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        av = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((av * r).astype(qkv.dtype))
    return jnp.concatenate(outs, axis=-1)


def _lane_block_mask(g, c, dh, dtype):
    """(g*c, g*dh) selector: 1 where the row's stack segment (row // c)
    equals the lane's head block (lane // dh) — multiplying a g-fold
    sublane stack of a (c, g*dh) head-group slab by this mask produces the
    block-diagonal expanded operand the grouped matmuls contract against."""
    r = jax.lax.broadcasted_iota(jnp.int32, (g * c, g * dh), 0) // c
    ln = jax.lax.broadcasted_iota(jnp.int32, (g * c, g * dh), 1) // dh
    return (r == ln).astype(dtype)


def _tiled_seq_mask(g, rows, seq):
    """(rows, g*rows) bool: the per-``seq`` block-diagonal mask repeated
    across the g stacked score segments — built directly from iota
    (Mosaic rejects concatenation of i1 vectors: bitcast_vreg i1->i32
    "Invalid vector register cast", probed on chip)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, g * rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, g * rows), 1)
    return (r // seq) == ((c % rows) // seq)


def _stack_rows(x, g):
    """g-fold sublane stack [x; x; ...] — concatenate, which Mosaic lowers
    on the major dim (jnp.tile is riskier inside a kernel body)."""
    return x if g == 1 else jnp.concatenate([x] * g, axis=0)


def _collapse_segments(t, g, rows):
    """Sum a (g*rows, n) stack to (rows, n) by adding its g sublane slices
    (the Mosaic-safe form of reshape(g, rows, n).sum(0))."""
    out = t[:rows]
    for h in range(1, g):
        out = out + t[h * rows:(h + 1) * rows]
    return out


def _seg_sum_matrix(g, c, dtype):
    """(g*c, g) static 0/1: column h selects rows of stack segment h —
    right-multiplying a (rows, g*c) tile by it takes per-segment row sums
    on the MXU (the VPU has no cheap lane-segment reduction)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (g * c, g), 0) // c
    h = jax.lax.broadcasted_iota(jnp.int32, (g * c, g), 1)
    return (r == h).astype(dtype)


def _lane_expand_matrix(g, dh, dtype):
    """(g, g*dh) static 0/1: broadcasts a per-(row, segment) scalar to the
    segment's dh-lane block via one tiny matmul."""
    h = jax.lax.broadcasted_iota(jnp.int32, (g, g * dh), 0)
    ln = jax.lax.broadcasted_iota(jnp.int32, (g, g * dh), 1) // dh
    return (h == ln).astype(dtype)


def grouped_heads_attention(qkv, seq, heads, dh, group):
    """Exact MHSA with ``group`` heads fused per matmul (kernel-body
    helper, same contract as ``masked_heads_attention`` with the
    block-diagonal per-``seq`` mask).

    Why: the per-head formulation issues 2 tiny K=dh matmuls per head —
    at dh=32 the MXU runs its contraction at 25% utilization, and every
    q/k/v head slice is a lane-UNALIGNED 32-lane extract (measured: the
    attention fwd+bwd is ~52% of the fused temporal-train step while
    being ~1% of its FLOPs, campaign_r4/train_kernel_ablation.log).

    The grouped form stacks g heads' scores side by side in lanes:

      q_g = qkv[:, g0*dh:(g0+g)*dh]          (C, g*dh)  ALIGNED slice
      K'' = tile(k_g, (g, 1)) * lane_mask    (g*C, g*dh) block-diagonal
      S   = q_g @ K''^T                      (C, g*C) = [s_h0 | ... ]

    K'' rows of segment h are zero outside head h's lane block, so every
    S entry is EXACTLY one head's score — no waste entries, and the
    contraction runs at K = g*dh (128 for g=4, dh=32: full MXU K-width).
    FLOPs grow g-fold on zeros while utilization grows g-fold: net-even
    on matmul time with 1/g the issues and zero unaligned lane slices.
    Per-segment softmax normalizers and their lane broadcast ride tiny
    static 0/1 matmuls (MXU) instead of lane-segment VPU reductions.
    """
    rows, three_dim = qkv.shape
    dim = three_dim // 3
    scale = dh ** -0.5
    g = group
    seq_mask = None
    if seq is not None:
        seq_mask = _tiled_seq_mask(g, rows, seq)
    lane_mask = _lane_block_mask(g, rows, dh, qkv.dtype)
    # the normalizer row-sums stay f32 (per-head parity: sum(e) is f32);
    # the seg matmul is tiny ((C, g*C) x (g*C, g)) so the f32 MXU rate
    # doesn't matter
    seg_sum = _seg_sum_matrix(g, rows, jnp.float32)
    lane_expand = _lane_expand_matrix(g, dh, jnp.float32)
    outs = []
    for g0 in range(0, heads, g):
        sl = slice(g0 * dh, (g0 + g) * dh)
        qg = qkv[:, sl]
        kg = qkv[:, dim + g0 * dh:dim + (g0 + g) * dh]
        vg = qkv[:, 2 * dim + g0 * dh:2 * dim + (g0 + g) * dh]
        kx = _stack_rows(kg, g) * lane_mask  # (g*C, g*dh)
        vx = _stack_rows(vg, g) * lane_mask
        s = jax.lax.dot_general(
            qg, kx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (C, g*C)
        if seq_mask is not None:
            s = jnp.where(seq_mask, s, -jnp.inf)
        e = score_exp(s)
        ssum = jax.lax.dot_general(  # (C, g) per-segment row sums
            e, seg_sum, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r_lanes = jax.lax.dot_general(  # (C, g*dh) normalizer broadcast
            1.0 / ssum, lane_expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        av = jax.lax.dot_general(
            e.astype(qkv.dtype), vx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (C, g*dh)
        outs.append((av * r_lanes).astype(qkv.dtype))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def grouped_attention_chunk_bwd(qkv, datt, seq, heads, dh, group):
    """dqkv (C, 3*dim) f32 for ONE row chunk, grouped-head formulation.

    Same probs-factored algebra as the per-head backward (every use of
    a = e*r factors so only e touches the score tile; see
    pallas_stblock_train._attention_bwd) with every per-head matmul
    replaced by its grouped block-diagonal twin:

      dP = do_g @ V'^T   (C, g*C)      dv = segsum((e^T @ rdo) * mask)
      c  = r * rowsum_seg(dP * e)      ds' = e * dP - c_cols * e
      dq = (ds' @ K'') * r_lanes * scale
      dk = segsum((ds'^T @ (q_g * r_lanes)) * mask) * scale

    The two (g*C, g*dh) products (dv, dk) come back stacked by segment;
    the same static lane mask isolates each head's lanes and a sublane
    segment-sum collapses the stack — aligned ops only.
    """
    rows, three_dim = qkv.shape
    dim = three_dim // 3
    scale = dh ** -0.5
    g = group
    dt = qkv.dtype
    seq_mask = None
    if seq is not None:
        seq_mask = _tiled_seq_mask(g, rows, seq)
    lane_mask = _lane_block_mask(g, rows, dh, dt)
    lane_mask_f = lane_mask.astype(jnp.float32)
    seg_sum = _seg_sum_matrix(g, rows, jnp.float32)  # f32: normalizer sums
    lane_expand = _lane_expand_matrix(g, dh, jnp.float32)
    dqs, dks, dvs = [], [], []
    for g0 in range(0, heads, g):
        qg = qkv[:, g0 * dh:(g0 + g) * dh]
        kg = qkv[:, dim + g0 * dh:dim + (g0 + g) * dh]
        vg = qkv[:, 2 * dim + g0 * dh:2 * dim + (g0 + g) * dh]
        do = datt[:, g0 * dh:(g0 + g) * dh]
        kx = _stack_rows(kg, g) * lane_mask
        vx = _stack_rows(vg, g) * lane_mask
        s = jax.lax.dot_general(
            qg, kx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if seq_mask is not None:
            s = jnp.where(seq_mask, s, -jnp.inf)
        e = score_exp(s)  # (C, g*C) f32
        ssum = jax.lax.dot_general(
            e, seg_sum, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = 1.0 / ssum  # (C, g)
        r_lanes = jax.lax.dot_general(
            r, lane_expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (C, g*dh)
        e_dt = e.astype(dt)
        # datt may arrive f32 (the sub-block backward's row grads) while
        # the slab operands are bf16 — matmul operands must share dtype
        do_dt = do.astype(dt)
        rdo = (do.astype(jnp.float32) * r_lanes).astype(dt)
        # dv: stacked (g*C, g*dh), mask to own-head lanes, collapse stack
        t2 = jax.lax.dot_general(
            e_dt, rdo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dvs.append(_collapse_segments(t2 * lane_mask_f, g, rows))
        # dP and ds'
        dp = jax.lax.dot_general(
            do_dt, vx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (C, g*C)
        t = dp * e
        c = r * jax.lax.dot_general(
            t, seg_sum, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (C, g)
        c_cols = jax.lax.dot_general(  # segment broadcast of c over g*C
            c, seg_sum, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_dt = (t - c_cols * e).astype(dt)  # == e*(dP - c)
        # dq = (ds' @ K'') * r * scale — aligned (C, g*dh)
        dqs.append(jax.lax.dot_general(
            ds_dt, kx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (r_lanes * scale))
        # dk: stacked product with r*q, mask, collapse, * scale
        rq = (qg.astype(jnp.float32) * r_lanes).astype(dt)
        tk = jax.lax.dot_general(
            ds_dt, rq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (g*C, g*dh)
        dks.append(_collapse_segments(tk * lane_mask_f, g, rows) * scale)

    def cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    return jnp.concatenate([cat(dqs), cat(dks), cat(dvs)], axis=-1)


def frame_chunked_attention(qkv, seq, heads, dh, chunk):
    """Exact packed attention computed in sequence-aligned row chunks.

    Equivalent to ``masked_heads_attention(qkv, block_diag_mask(rows, seq),
    ...)`` — chunks align to sequence boundaries, so no sequence's scores
    cross a chunk edge — but the score matmuls shrink from (rows, rows) to
    (chunk, chunk). Those matmuls contract over dh (32/64), i.e. run the
    MXU at 25-50% utilization, and their FLOPs scale with the packed
    width, so they (not the exp — measured free,
    experiments/batched_dot_probe.py) are what the packing waste costs:
    chunking cuts them rows/chunk-fold while the cell's dense matmuls
    keep their full-width M.

    qkv (rows, 3*heads*dh) with rows % chunk == 0 and chunk % seq == 0.
    """
    rows = qkv.shape[0]
    if chunk >= rows or rows % chunk or chunk % seq:
        # misaligned chunking would split a sequence across chunks —
        # fall back to the single full-width masked product (still exact)
        return masked_heads_attention(
            qkv, block_diag_mask(rows, seq), heads, dh)
    mask = block_diag_mask(chunk, seq)
    outs = [
        masked_heads_attention(qkv[c0:c0 + chunk], mask, heads, dh)
        for c0 in range(0, rows, chunk)
    ]
    return jnp.concatenate(outs, axis=0)


def grouped_chunked_attention(qkv, seq, heads, dh, group, chunk):
    """Grouped-head attention (``grouped_heads_attention``) computed in
    frame-aligned ``chunk``-row score tiles — the serving-side analogue of
    the fused train kernels' ``_attention_fwd`` (ops/pallas_stblock_train):
    chunking bounds the (C, g*C) grouped score tile at C = chunk while the
    cell's dense matmuls keep their full-width M. Falls back to one
    full-width grouped product when chunking would split a sequence (same
    predicate as ``frame_chunked_attention``); ``seq=None`` is full
    attention over all rows in one grouped product."""
    rows = qkv.shape[0]
    if seq is None or chunk >= rows or rows % chunk or chunk % seq:
        return grouped_heads_attention(qkv, seq, heads, dh, group)
    outs = [
        grouped_heads_attention(qkv[c0:c0 + chunk], seq, heads, dh, group)
        for c0 in range(0, rows, chunk)
    ]
    return jnp.concatenate(outs, axis=0)


def chunk_for(seq: int) -> int:
    """Attention-chunk default: smallest multiple of ``seq`` >= 128 — big
    enough to keep the (chunk, dh) matmul M-dim efficient, small enough
    that the (chunk, chunk) score work stays near the 17-token minimum."""
    return -(-128 // seq) * seq


def _packed_kernel(qkv_ref, out_ref, *, seq, heads, dh, rows):
    out_ref[...] = frame_chunked_attention(
        qkv_ref[...], seq, heads, dh, chunk_for(seq))


def _packed_flat_attention_fwd_impl(qkv, seq, heads, interpret):
    rows_total, three_dim = qkv.shape
    dim = three_dim // 3
    dh = dim // heads
    rows = _rows_per_cell(seq)
    # pad to a whole number of cells: padded rows form their own all-zero
    # sequences under the block-diagonal mask (uniform softmax over zeros
    # -> zero output), fully isolated from real rows, sliced off below
    pad = (-rows_total) % rows
    if pad:
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((pad, three_dim), qkv.dtype)], axis=0)
    grid = ((rows_total + pad) // rows,)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, seq=seq, heads=heads, dh=dh,
                          rows=rows),
        out_shape=jax.ShapeDtypeStruct((rows_total + pad, dim), qkv.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((rows, 3 * dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv)
    return out[:rows_total] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def packed_flat_attention(qkv, seq: int, heads: int, interpret: bool = False):
    """MHSA over flat rows. qkv (n_seqs*seq, 3*dim) -> (n_seqs*seq, dim).

    Column layout [q | k | v], head h of q at cols [h*dh, (h+1)*dh) — the
    layout ``nn.Dense(3*dim)`` + split produces.
    """
    return _packed_flat_attention_fwd_impl(qkv, seq, heads, interpret)


def _pfa_fwd(qkv, seq, heads, interpret):
    return _packed_flat_attention_fwd_impl(qkv, seq, heads, interpret), qkv


def _pfa_bwd(seq, heads, interpret, qkv, g):
    _, vjp = jax.vjp(lambda x: _xla_attention_flat(x, seq, heads), qkv)
    return vjp(g)


packed_flat_attention.defvjp(_pfa_fwd, _pfa_bwd)


def _seq_kernel(qkv_ref, out_ref, *, heads, dh, length):
    del length  # block shape already pins it
    out_ref[0] = masked_heads_attention(qkv_ref[0], None, heads, dh)


def _xla_attention_3d(qkv, heads):
    n, length, three_dim = qkv.shape
    dim = three_dim // 3
    flat = qkv.reshape(n * length, three_dim)
    return _xla_attention_flat(flat, length, heads).reshape(n, length, dim)


def _seq_attention_fwd_impl(qkv, heads, interpret):
    n, length, three_dim = qkv.shape
    dim = three_dim // 3
    dh = dim // heads
    return pl.pallas_call(
        functools.partial(_seq_kernel, heads=heads, dh=dh, length=length),
        out_shape=jax.ShapeDtypeStruct((n, length, dim), qkv.dtype),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, length, three_dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, length, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def seq_attention(qkv, heads: int, interpret: bool = False):
    """MHSA, one sequence per grid cell. qkv (N, L, 3*dim) -> (N, L, dim).

    For L too long to pack (e.g. the 243-frame temporal axis). L need not
    be tile-aligned — Mosaic pads the block internally.
    """
    return _seq_attention_fwd_impl(qkv, heads, interpret)


def _sa_fwd(qkv, heads, interpret):
    return _seq_attention_fwd_impl(qkv, heads, interpret), qkv


def _sa_bwd(heads, interpret, qkv, g):
    _, vjp = jax.vjp(lambda x: _xla_attention_3d(x, heads), qkv)
    return vjp(g)


seq_attention.defvjp(_sa_fwd, _sa_bwd)
