"""NHWC soft-argmax decode: Pallas pair-kernel vs XLA, fwd and fwd+bwd.

Production shape: (B=64, 64, 64, 17*64) f32 off the conv head.
Two-K scan timing (see bench.py docstring).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/decode_bench.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

B = 64
K1, K2 = 10, 30


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.ops.heatmap import soft_argmax_3d_nhwc
    from pose3d_tpu.ops.pallas_softargmax import soft_argmax_3d_nhwc_pallas

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, 64, 64, 17 * 64)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((B, 17 * 3)).astype(np.float32))

    def fwd_chain(decode, k):
        @jax.jit
        def chain(x):
            def body(carry, _):
                c = decode(x + carry * 1e-6)
                return jnp.mean(c), c[0, 0]

            c, s = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return lambda: float(chain(x0))

    def bwd_chain(decode, k):
        def loss(x):
            return jnp.sum((decode(x) - tgt) ** 2)

        @jax.jit
        def chain(x):
            def body(carry, _):
                l, g = jax.value_and_grad(loss)(x + carry * 1e-6)
                return jnp.mean(g) + l * 1e-9, l

            c, s = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return lambda: float(chain(x0))

    def two_k(mk):
        r1, r2 = mk(K1), mk(K2)
        r1(); r2()
        t0 = time.perf_counter(); r1(); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); r2(); t2 = time.perf_counter() - t0
        return (t2 - t1) / (K2 - K1)

    vol_bytes = x0.size * 4
    for name, decode in [
        ("xla", functools.partial(soft_argmax_3d_nhwc, num_joints=17, depth=64)),
        ("pallas", functools.partial(soft_argmax_3d_nhwc_pallas,
                                     num_joints=17, depth=64)),
    ]:
        t = two_k(lambda k: fwd_chain(decode, k))
        log(f"{name} fwd: {t*1e3:.3f} ms ({vol_bytes/t/1e9:.0f} GB/s read)")
        t = two_k(lambda k: bwd_chain(decode, k))
        log(f"{name} fwd+bwd: {t*1e3:.3f} ms "
            f"({3*vol_bytes/t/1e9:.0f} GB/s at 3 passes)")


if __name__ == "__main__":
    main()
