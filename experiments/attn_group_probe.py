"""On-chip probe: head-GROUPED attention in the fused train kernels.

The round-4 ablation (campaign_r4/train_kernel_ablation.log) measured
attention fwd+bwd at ~52% of both halves of the fused temporal-train step
(spatial 18.50 -> 8.88 ms without it, temporal 17.03 -> 8.49) while being
~1% of the FLOPs — the per-head loop issues tiny K=32 matmuls (25% MXU
contraction utilization) over lane-UNALIGNED 32-wide q/k/v slices.

pallas_attention.grouped_heads_attention fuses ATTN_GROUP heads per
matmul via block-diagonal expanded operands (K = group*32, aligned
slices only). This probe measures the fused spatial/temporal x5
fwd+grad chains (same harness as train_kernel_ablation) across
ATTN_GROUP in {None, 2, 4, 8} and ATTN_CHUNK in {136, 272} to pick the
shipping default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/attn_group_probe.py
"""

from __future__ import annotations

import contextlib
import sys
import time

import numpy as np

B, T, J, D = 8, 243, 17, 256
K1, K2 = 4, 12


def log(m):
    print(m, file=sys.stderr, flush=True)


def two_k(make_chain, *args):
    c1 = make_chain(K1).lower(*args).compile()
    c2 = make_chain(K2).lower(*args).compile()

    def run(c):
        out = c(*args)
        while isinstance(out, (tuple, list)):
            out = out[-1]
        return float(np.asarray(out).ravel()[0])

    run(c1); run(c2)
    t1s, t2s = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(c1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(c2); t2s.append(time.perf_counter() - t0)
    per = (np.median(t2s) - np.median(t1s)) / (K2 - K1)
    return per if per > 0 else np.median(t2s) / K2


@contextlib.contextmanager
def patched(*patches):
    saved = [(m, a, getattr(m, a)) for m, a, _ in patches]
    for m, a, r in patches:
        setattr(m, a, r)
    try:
        yield
    finally:
        for m, a, v in saved:
            setattr(m, a, v)


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops import pallas_stblock_train as st
    from pose3d_tpu.ops.pallas_stblock import (
        pack_spatial_weights,
        pack_temporal_weights,
    )

    rng = np.random.default_rng(0)
    model = TemporalLifter(dtype=jnp.bfloat16, use_pallas=False)
    x0 = jnp.asarray(rng.random((2, T, J, 2)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x0)["params"]
    sw = [pack_spatial_weights(params[f"SpatioTemporalBlock_{b}"])
          for b in range(5)]
    tw = [pack_temporal_weights(params[f"SpatioTemporalBlock_{b}"])
          for b in range(5)]

    rows = jnp.asarray(
        rng.random((B * T * J, D)).astype(np.float32), jnp.bfloat16)
    grows = jnp.asarray(
        rng.random((B * T * J, D)).astype(np.float32), jnp.bfloat16)
    slab = jnp.asarray(
        rng.random((B, T, J * D)).astype(np.float32), jnp.bfloat16)
    gslab = jnp.asarray(
        rng.random((B, T, J * D)).astype(np.float32), jnp.bfloat16)

    def chain_spatial(k):
        @jax.jit
        def f(x, g, *w5):
            def body(xc, _):
                def loss(xx):
                    for w in w5:
                        xx = st.spatial_block_train(xx, *w, False)
                    return jnp.vdot(xx.astype(jnp.float32),
                                    g.astype(jnp.float32))
                dx = jax.grad(loss)(xc)
                return xc + dx.astype(xc.dtype) * jnp.bfloat16(1e-4), dx[0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    def chain_temporal(k):
        @jax.jit
        def f(x, g, *w5):
            def body(xc, _):
                def loss(xx):
                    for w in w5:
                        xx = st.temporal_slab_train(xx, *w, False)
                    return jnp.vdot(xx.astype(jnp.float32),
                                    g.astype(jnp.float32))
                dx = jax.grad(loss)(xc)
                return xc + dx.astype(xc.dtype) * jnp.bfloat16(1e-4), \
                    dx[0, 0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    variants = [
        ("group=None (per-head)", None, 136),
        ("group=2  chunk=136", 2, 136),
        ("group=4  chunk=136", 4, 136),
        ("group=4  chunk=272", 4, 272),
        ("group=8  chunk=136", 8, 136),
        ("group=8  chunk=272", 8, 272),
    ]
    for name, chain, args in (
            ("spatial ", chain_spatial, (rows, grows, *sw)),
            ("temporal", chain_temporal, (slab, gslab, *tw))):
        for label, group, chunk in variants:
            try:
                with patched((st, "ATTN_GROUP", group),
                             (st, "ATTN_CHUNK", chunk)):
                    t = two_k(chain, *args)
                log(f"{name} x5 fwd+grad {label:22s}: {t*1e3:7.2f} ms")
            except Exception as e:
                log(f"{name} x5 fwd+grad {label:22s}: FAILED "
                    f"({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
