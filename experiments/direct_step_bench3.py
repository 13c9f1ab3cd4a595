"""Direct-model step: bf16 compute-dtype variants (the real lever).

Experiment 2 showed fwd+bwd alone is ~92 ms/step at f32 — the step is
compute-bound (R50+deconv at 256^2 is ~10 GFLOP/frame forward; v5e executes
f32 convs as multi-pass bf16), not optimizer-relayout-bound as round 1
hypothesized. Variants here:

  B1  bf16 model, XLA NHWC decode, rolled scan, donated
  B2  bf16 model, Pallas pair-kernel decode IN TRAINING
      (use_pallas_train=True -- the original version of this script set
      use_pallas=True only, which the model ignores when train=True, so
      its "pallas" rows silently measured the XLA decode; fixed)
  B3  = B2 with fwd+bwd only (no optimizer) for the split

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/direct_step_bench3.py
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

    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.random((K1, B, HW, HW, 3), np.float32))
    f2 = jnp.asarray(rng.random((K2, B, HW, HW, 3), np.float32))
    kp1 = jnp.asarray(rng.random((K1, B, 17, 3), np.float32) - 0.5)
    kp2 = jnp.asarray(rng.random((K2, B, 17, 3), np.float32) - 0.5)

    def two_k(run1, run2):
        run1(); run2()
        t0 = time.perf_counter(); run1(); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run2(); t2 = time.perf_counter() - t0
        per = (t2 - t1) / (K2 - K1)
        return per, t1, t2

    def make_state(use_pallas):
        model = PoseNet3D(return_heatmap=False, use_pallas=use_pallas,
                          use_pallas_train=use_pallas,
                          dtype=jnp.bfloat16)
        return create_train_state(
            model, jax.random.key(0), jnp.zeros((B, HW, HW, 3)), lr=1e-3,
        )

    def full(name, use_pallas):
        st0 = make_state(use_pallas)
        step = make_direct_chunk_step(donate=True)

        def runner(fr, kp):
            def run():
                st = jax.tree_util.tree_map(lambda x: x.copy(), st0)
                _, m = step(st, fr, kp, jax.random.key(1))
                return float(m["loss"])
            return run

        per, t1, t2 = two_k(runner(f1, kp1), runner(f2, kp2))
        log(f"{name}: {per*1e3:.2f} ms/step ({B/per:,.0f} frames/s) "
            f"(K{K1} {t1*1e3:.0f} ms, K{K2} {t2*1e3:.0f} ms)")

    def grad_only(name, use_pallas):
        st = make_state(use_pallas)

        @jax.jit
        def chain(params, bs, frames, kps):
            def body(carry, xs):
                f, y = xs

                def loss_fn(p):
                    (coords, _), upd = st.apply_fn(
                        {"params": p, "batch_stats": bs}, f, train=True,
                        mutable=["batch_stats"],
                    )
                    return jnp.mean((coords.reshape(y.shape) - y) ** 2)

                l, g = jax.value_and_grad(loss_fn)(params)
                gsum = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x).astype(jnp.float32),
                    g, jnp.float32(0.0),
                )
                return carry + l + gsum * 1e-9, l

            c, _ = jax.lax.scan(body, jnp.float32(0.0), (frames, kps))
            return c

        def runner(fr, kp):
            return lambda: float(chain(st.params, st.batch_stats, fr, kp))

        per, t1, t2 = two_k(runner(f1, kp1), runner(f2, kp2))
        log(f"{name}: {per*1e3:.2f} ms/step (K{K1} {t1*1e3:.0f} ms, "
            f"K{K2} {t2*1e3:.0f} ms)")

    full("B1 bf16 xla-decode full-step", use_pallas=False)
    full("B2 bf16 pallas-decode full-step", use_pallas=True)
    grad_only("B3 bf16 pallas fwd+bwd only", use_pallas=True)


if __name__ == "__main__":
    main()
