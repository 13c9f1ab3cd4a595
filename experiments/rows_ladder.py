"""Post-chunking ROWS ladder (real chip): with frame-chunked score tiles
the per-row score work no longer scales with the cell width, so larger
grid cells — better dense-matmul M-efficiency, fewer weight refetches —
may now beat the pre-chunking knees (lifter 272, serving spatial 544,
train spatial 272; ROUND3_NOTES ladders were measured pre-chunking).

Sweeps (two-K fenced scan methodology, bench.py docstring):
  1. lifter megakernel iter at B=8192, pallas_lifter.ROWS {272, 544, 1088}
  2. temporal serving forward at B=16, pallas_stblock.ROWS {544, 1088}
  3. temporal train step at B=8, stblock_train.TRAIN_ROWS {272, 544}

Module constants are monkeypatched per point; the inner jit caches are
cleared so the new constant actually retraces.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/rows_ladder.py
Optional argv: section numbers to run, e.g. `rows_ladder.py 3` or `1 3`.
A config whose compile fails (e.g. a VMEM-OOM reject) is logged and
skipped — one bad point must not kill the later sections.
"""

from __future__ import annotations

import sys
import time

import numpy as np

K1, K2 = 8, 24


def log(m):
    print(m, file=sys.stderr, flush=True)


def want(section):
    picks = [a for a in sys.argv[1:] if a.isdigit()]
    return not picks or str(section) in picks


def two_k_scan(make_chain, *args):
    c1 = make_chain(K1).lower(*args).compile()
    c2 = make_chain(K2).lower(*args).compile()

    def run(c):
        out = c(*args)
        return float(out if not isinstance(out, tuple) else out[-1])

    run(c1); run(c2)
    # best-of-N per chain, THEN difference — min over per-trial differences
    # goes negative when a contention spike hits the K1 run of one trial
    # (produced a -556 ms "time" in the round-4 ladder)
    b1 = b2 = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); run(c1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); run(c2); b2 = min(b2, time.perf_counter() - t0)
    per = (b2 - b1) / (K2 - K1)
    return per if per > 0 else b2 / K2


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # ---- 1. lifter megakernel
    from pose3d_tpu.models.lifters import (
        JointTransformerLifter,
        sinusoidal_positional_embeddings,
    )
    from pose3d_tpu.ops import pallas_lifter as pk

    B = 8192
    m = JointTransformerLifter(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((B, 17, 2)).astype(np.float32))
    params = jax.jit(
        lambda r, xx: m.init({"params": r}, xx, train=False)
    )(jax.random.key(0), x)["params"]
    pe = sinusoidal_positional_embeddings(17, 256)

    def lifter_chain(k):
        @jax.jit
        def f(pp, xx):
            def body(c, _):
                o = pk.lifter_forward_fused(pp, c, pe=pe)
                return c + o[..., :2] * jnp.float32(1e-6), o[0, 0, 0]
            xk, s = jax.lax.scan(body, xx, None, length=k)
            return xk, s[-1]
        return f

    if want(1):
        for rows in (272, 544, 1088):
            pk.ROWS = rows
            pk._trunk.clear_cache()
            try:
                t = two_k_scan(lifter_chain, params, x)
            except Exception as e:
                log(f"lifter B={B} ROWS={rows:4d}: FAILED "
                    f"({type(e).__name__}: {str(e)[:120]})")
                continue
            log(f"lifter B={B} ROWS={rows:4d}: {t*1e3:6.2f} ms "
                f"({B/t:,.0f} frames/s)")
        pk.ROWS = 272
        pk._trunk.clear_cache()

    # ---- 2. temporal serving forward
    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops import pallas_stblock as sb

    C = 16
    tm = TemporalLifter(dtype=jnp.bfloat16)
    xc = jnp.asarray(rng.random((C, 243, 17, 2)).astype(np.float32))
    tp = jax.jit(lambda r, xx: tm.init({"params": r}, xx))(
        jax.random.key(1), xc)["params"]

    def serve_chain(k):
        @jax.jit
        def f(pp, xx):
            def body(c, _):
                o = sb.temporal_forward_fused(pp, c)
                return c + o[..., :2] * jnp.float32(1e-6), o[0, 0, 0, 0]
            xk, s = jax.lax.scan(body, xx, None, length=k)
            return xk, s[-1]
        return f

    if want(2):
        for rows in (544, 1088):
            sb.ROWS = rows
            sb.spatial_block_fused.clear_cache()
            sb.temporal_slab_fused.clear_cache()
            try:
                t = two_k_scan(serve_chain, tp, xc)
            except Exception as e:
                log(f"serving C={C} spatial ROWS={rows:4d}: FAILED "
                    f"({type(e).__name__}: {str(e)[:120]})")
                continue
            log(f"serving C={C} spatial ROWS={rows:4d}: {t*1e3:6.2f} ms "
                f"({C*243/t:,.0f} frames/s)")
        sb.ROWS = 544
        sb.spatial_block_fused.clear_cache()

    # ---- 3. temporal train step
    from pose3d_tpu.ops import pallas_stblock_train as st
    from pose3d_tpu.ops.pallas_stblock_train import make_fused_train_apply
    from pose3d_tpu.train.epoch import make_lifter_epoch_fn
    from pose3d_tpu.train.state import create_train_state

    Bt = 8
    epoch = make_lifter_epoch_fn(donate=False)
    state = create_train_state(
        tm, jax.random.key(0), jnp.zeros((Bt, 243, 17, 2)), lr=1e-3)
    state = state.replace(apply_fn=make_fused_train_apply())
    y1 = jnp.asarray(rng.random((K2, Bt, 243, 17, 2), np.float32))
    y2 = jnp.asarray(rng.random((K2, Bt, 243, 17, 3), np.float32) - 0.5)
    key = jax.random.key(1)

    def step_chain(k):
        def f(s, a, b, kk):
            return epoch(s, a[:k], b[:k], kk)
        return jax.jit(f)

    if not want(3):
        return
    for rows in (272, 544):
        st.TRAIN_ROWS = rows
        try:
            c1 = step_chain(K1).lower(state, y1, y2, key).compile()
            c2 = step_chain(K2).lower(state, y1, y2, key).compile()
        except Exception as e:
            log(f"train B={Bt} TRAIN_ROWS={rows:4d}: FAILED "
                f"({type(e).__name__}: {str(e)[:120]})")
            continue

        def run(c):
            _, mtr = c(state, y1, y2, key)
            return float(mtr["loss"])

        run(c1); run(c2)
        b1 = b2 = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); run(c1); b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter(); run(c2); b2 = min(b2, time.perf_counter() - t0)
        best = (b2 - b1) / (K2 - K1)
        if best <= 0:
            best = b2 / K2
        log(f"train B={Bt} TRAIN_ROWS={rows:4d}: {best*1e3:6.2f} ms "
            f"({Bt*243/best:,.0f} frames/s)")
    st.TRAIN_ROWS = 272


if __name__ == "__main__":
    main()
