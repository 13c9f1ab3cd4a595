"""ATTN_CHUNK ladder for the fused TRAIN kernels (real chip).

Isolates the spatial fwd+bwd chain (5 layers, B=8 rows) and the temporal
fwd+bwd chain, then the full train step, at chunk widths {off, 136, 68}.
The chunk is read at trace time from the module attribute, so the ladder
monkeypatches pose3d_tpu.ops.pallas_stblock_train.ATTN_CHUNK per point.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/train_bwd_ladder.py
"""

from __future__ import annotations

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
        return float(c(*args)[-1])

    run(c1); run(c2)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (K2 - K1))
    return best


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops import pallas_stblock_train as st
    from pose3d_tpu.ops.pallas_stblock import (
        pack_spatial_weights,
        pack_temporal_weights,
    )
    from pose3d_tpu.train.epoch import make_lifter_epoch_fn
    from pose3d_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    model = TemporalLifter(dtype=jnp.bfloat16, use_pallas=False)
    x0 = jnp.asarray(rng.random((2, T, J, 2)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x0)["params"]
    sw = [pack_spatial_weights(params[f"SpatioTemporalBlock_{b}"])
          for b in range(5)]
    rows = jnp.asarray(
        rng.random((B * T * J, D)).astype(np.float32), jnp.bfloat16)
    dout = jnp.asarray(
        rng.random((B * T * J, D)).astype(np.float32), jnp.bfloat16)

    def chain_spatial_grad(k):
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

    for chunk in (272, 136, 68):
        st.ATTN_CHUNK = chunk
        t = two_k(chain_spatial_grad, rows, dout, *sw)
        label = "off" if chunk >= st.TRAIN_ROWS else str(chunk)
        log(f"spatial fwd+bwd x5, chunk {label:>4s}: {t*1e3:7.2f} ms")

    # full train step at each chunk
    from pose3d_tpu.ops.pallas_stblock_train import make_fused_train_apply

    epoch = make_lifter_epoch_fn(donate=False)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, T, J, 2)), lr=1e-3)
    state = state.replace(apply_fn=make_fused_train_apply())
    y1 = jnp.asarray(rng.random((K2, B, T, J, 2), np.float32))
    y2 = jnp.asarray(rng.random((K2, B, T, J, 3), np.float32) - 0.5)
    key = jax.random.key(1)

    def step_chain(k):
        def f(s, a, b, kk):
            return epoch(s, a[:k], b[:k], kk)
        return jax.jit(f)

    for chunk in (136, 68, 272):
        st.ATTN_CHUNK = chunk
        c1 = step_chain(K1).lower(state, y1, y2, key).compile()
        c2 = step_chain(K2).lower(state, y1, y2, key).compile()

        def run(c):
            _, m = c(state, y1, y2, key)
            return float(m["loss"])

        run(c1); run(c2)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
            best = min(best, (t2 - t1) / (K2 - K1))
        label = "off" if chunk >= st.TRAIN_ROWS else str(chunk)
        log(f"full train step, chunk {label:>4s}: {best*1e3:7.2f} ms "
            f"({B*T/best:,.0f} frames/s)")


if __name__ == "__main__":
    main()
