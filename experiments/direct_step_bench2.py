"""Disentangle the direct-model step cost: fwd+bwd vs optimizer variants.

Round-1 recorded 15.5 ms fwd+bwd and 48.9 ms full step; experiment 1 (this
round) measured 92-93 ms for the full step, rolled AND unrolled. This script
separates the factors on the real chip:

  F   fwd+bwd only, rolled scan (grads materialized, no update)
  S1  full step, plain adamw (create_train_state default), rolled
  S2  full step, plain adamw, rolled, DONATED state
  S3  full step, plain adamw, unrolled, donated
  S4  full step, adamw, bf16 model compute dtype, rolled, donated

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/direct_step_bench2.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

B, HW = 64, 256
K1, K2 = 4, 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.heads import PoseNet3D
    from pose3d_tpu.train.image_steps import make_direct_chunk_step
    from pose3d_tpu.train.state import create_train_state

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.random((K1, B, HW, HW, 3), np.float32))
    f2 = jnp.asarray(rng.random((K2, B, HW, HW, 3), np.float32))
    kp1 = jnp.asarray(rng.random((K1, B, 17, 3), np.float32) - 0.5)
    kp2 = jnp.asarray(rng.random((K2, B, 17, 3), np.float32) - 0.5)

    def two_k(run1, run2):
        run1(); run2()           # compile both
        t0 = time.perf_counter(); run1(); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run2(); t2 = time.perf_counter() - t0
        return (t2 - t1) / (K2 - K1), t1, t2

    def make_state(dtype=jnp.float32):
        model = PoseNet3D(return_heatmap=False, use_pallas=False, dtype=dtype)
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((B, HW, HW, 3)), lr=1e-3,
        )

    # --- F: fwd+bwd only, rolled scan, no optimizer -----------------------
    state = make_state()

    # fwd+bwd with the grad folded into a scalar carry: every step must run,
    # but params stay LOOP-INVARIANT (XLA hoists their layout once)
    def make_gradchain2(k, frames, kps):
        @jax.jit
        def chain(params, bs, frames, kps):
            def body(carry, xs):
                f, y = xs

                def loss_fn(p):
                    (coords, _), upd = state.apply_fn(
                        {"params": p, "batch_stats": bs}, f, train=True,
                        mutable=["batch_stats"],
                    )
                    return jnp.mean((coords.reshape(y.shape) - y) ** 2)

                l, g = jax.value_and_grad(loss_fn)(params)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x), g, jnp.float32(0.0)
                )
                return carry + l + gsum * 1e-9, l

            c, ls = jax.lax.scan(body, jnp.float32(0.0), (frames, kps))
            return c

        def run():
            return float(chain(state.params, state.batch_stats, frames, kps))

        return run

    per, t1, t2 = two_k(make_gradchain2(K1, f1, kp1), make_gradchain2(K2, f2, kp2))
    log(f"F fwd+bwd rolled (params loop-invariant): {per*1e3:.2f} ms/step "
        f"(K{K1} {t1*1e3:.0f} ms, K{K2} {t2*1e3:.0f} ms)")

    # --- S variants: full step ------------------------------------------
    def full(name, unroll, donate, dtype=jnp.float32):
        st0 = make_state(dtype)
        step = make_direct_chunk_step(donate=donate, unroll=unroll)

        def runner(fr, kp):
            def run():
                # fresh buffers per call so donation can't invalidate st0
                st = (jax.tree_util.tree_map(lambda x: x.copy(), st0)
                      if donate else st0)
                _, m = step(st, fr, kp, jax.random.key(1))
                return float(m["loss"])
            return run

        per, t1, t2 = two_k(runner(f1, kp1), runner(f2, kp2))
        log(f"{name}: {per*1e3:.2f} ms/step ({B/per:,.0f} frames/s) "
            f"(K{K1} {t1*1e3:.0f} ms, K{K2} {t2*1e3:.0f} ms)")

    full("S1 adamw rolled", unroll=False, donate=False)
    full("S2 adamw rolled donated", unroll=False, donate=True)
    full("S3 adamw unrolled donated", unroll=True, donate=True)
    full("S4 adamw rolled donated bf16", unroll=False, donate=True,
         dtype=jnp.bfloat16)


if __name__ == "__main__":
    main()
