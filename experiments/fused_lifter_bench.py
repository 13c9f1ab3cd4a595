"""Fused Pallas lifter trunk vs plain XLA apply on the real TPU.

Two-K scan timing (bench.py methodology), B=8192 — the headline config.
Also asserts numerical parity of the real (non-interpret) kernel vs the
bf16 flax apply before timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/fused_lifter_bench.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

B = 8192
K1, K2 = 30, 180


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.lifters import (
        JointTransformerLifter,
        sinusoidal_positional_embeddings,
    )
    from pose3d_tpu.ops.pallas_lifter import lifter_forward_fused

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, 17, 2)).astype(np.float32))
    model = JointTransformerLifter(dtype=jnp.bfloat16)
    params = model.init({"params": jax.random.key(0)}, x0, train=False)[
        "params"]
    pe = sinusoidal_positional_embeddings(17, 256)

    # --- parity of the real kernel first
    log("compiling parity check...")
    small = x0[:128]
    # NB: jit both sides — eager apply through the axon tunnel remote-
    # compiles every op individually (minutes)
    want = np.asarray(jax.jit(
        lambda p, x: model.apply({"params": p}, x, train=False)
    )(params, small))
    got = np.asarray(jax.jit(
        lambda p, x: lifter_forward_fused(p, x, pe=pe))(params, small))
    err = np.abs(got - want).max()
    log(f"parity vs bf16 flax apply: max abs err {err:.4f}")
    assert err < 5e-2, err

    def chain(apply_fn, k):
        def f(params, x):
            def body(kp, _):
                out = apply_fn(params, kp)
                return kp + out[..., :2] * 1e-3, out[0, 0, 0]

            kp, s = jax.lax.scan(body, x, None, length=k)
            return kp, s[-1]

        return jax.jit(f)

    def two_k(apply_fn):
        t0 = time.perf_counter()
        c1 = chain(apply_fn, K1).lower(params, x0).compile()
        log(f"  K{K1} compiled in {time.perf_counter()-t0:.0f}s")
        t0 = time.perf_counter()
        c2 = chain(apply_fn, K2).lower(params, x0).compile()
        log(f"  K{K2} compiled in {time.perf_counter()-t0:.0f}s")

        def run(c):
            _, s = c(params, x0)
            return float(s)

        run(c1); run(c2)
        t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
        return (t2 - t1) / (K2 - K1)

    t = two_k(lambda p, x: model.apply({"params": p}, x, train=False))
    log(f"xla apply  : {t*1e3:7.3f} ms/iter ({B/t:,.0f} frames/s)")
    t = two_k(lambda p, x: lifter_forward_fused(p, x, pe=pe))
    log(f"fused trunk: {t*1e3:7.3f} ms/iter ({B/t:,.0f} frames/s)")


if __name__ == "__main__":
    main()
