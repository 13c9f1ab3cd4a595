"""TemporalLifter with packed-attention Pallas kernels vs plain XLA.

Measures (two-K scan, v5e):
  inference B=16: use_pallas False vs True (+ real-kernel parity check)
  train step B=8: use_pallas False vs True (fwd = kernel, bwd = XLA
  recompute via custom_vjp)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/temporal_pallas_bench.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

B_INF = 16
K1, K2 = 8, 24
B_TR = 8
TK1, TK2 = 4, 12


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.train.epoch import make_lifter_epoch_fn
    from pose3d_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    t = 243
    x0 = jnp.asarray(rng.random((B_INF, t, 17, 2)).astype(np.float32))

    base = TemporalLifter(dtype=jnp.bfloat16)
    fast = TemporalLifter(dtype=jnp.bfloat16, use_pallas=True)
    params = base.init({"params": jax.random.key(0)}, x0)["params"]

    # real-kernel parity first
    small = x0[:2]
    want = np.asarray(jax.jit(
        lambda p, x: base.apply({"params": p}, x))(params, small))
    got = np.asarray(jax.jit(
        lambda p, x: fast.apply({"params": p}, x))(params, small))
    err = np.abs(got - want).max()
    log(f"parity (real kernels vs xla, bf16): max abs err {err:.5f}")
    assert err < 5e-2, err

    def two_k(model):
        def chain(k):
            @jax.jit
            def f(p, x):
                def body(kp, _):
                    out = model.apply({"params": p}, kp)
                    return kp + out[..., :2] * 1e-3, out[0, 0, 0, 0]

                kp, s = jax.lax.scan(body, x, None, length=k)
                return kp, s[-1]

            return f

        c1 = chain(K1).lower(params, x0).compile()
        c2 = chain(K2).lower(params, x0).compile()

        def run(c):
            _, s = c(params, x0)
            return float(s)

        run(c1); run(c2)
        t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
        return (t2 - t1) / (K2 - K1)

    for name, m in [("xla", base), ("pallas", fast)]:
        tt = two_k(m)
        log(f"infer {name:6s}: {tt*1e3:7.2f} ms/iter "
            f"({B_INF*t/tt:9,.0f} frames/s)")

    # training step
    epoch_fn = make_lifter_epoch_fn(donate=False)
    for name, m in [("xla", base), ("pallas", fast)]:
        state = create_train_state(
            m, jax.random.key(0), jnp.zeros((B_TR, t, 17, 2)), lr=1e-3)
        compiled = {}

        def runner(k, state=state, compiled=compiled):
            y1 = jnp.asarray(rng.random((k, B_TR, t, 17, 2), np.float32))
            y2 = jnp.asarray(
                rng.random((k, B_TR, t, 17, 3), np.float32) - 0.5)
            key = jax.random.key(1)
            compiled[k] = epoch_fn.lower(state, y1, y2, key).compile()

            def run():
                _, mm = compiled[k](state, y1, y2, key)
                return float(mm["loss"])

            return run

        r1, r2 = runner(TK1), runner(TK2)
        r1(); r2()
        t0 = time.perf_counter(); r1(); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); r2(); t2 = time.perf_counter() - t0
        per = (t2 - t1) / (TK2 - TK1)
        log(f"train {name:6s}: {per*1e3:7.2f} ms/step "
            f"({B_TR*t/per:9,.0f} frames/s)")


if __name__ == "__main__":
    main()
