"""Direct-model (R50 + 64^3 soft-argmax) train-step timing experiments.

Round-1 finding (ROUND1_NOTES): the fwd+bwd is 15.5 ms/step but the full
scanned step costs 48.9 ms at B=64 — ~33 ms of param-shaped relayout copies
forced by carrying params through a rolled lax.scan. This script measures the
candidate fixes on the real chip:

  A  rolled scan, XLA NHWC decode          (round-1 production path)
  B  rolled scan, Pallas NHWC decode       (new fused decode kernel)
  C  unrolled scan, XLA NHWC decode        (straight-line layout assignment)
  D  unrolled scan, Pallas NHWC decode     (both fixes)

Methodology: two scan lengths K1 < K2 per variant, fenced by host
materialization; per-step time = (t2 - t1) / (K2 - K1) — tunnel RTT and
constant overhead cancel (see bench.py docstring).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/direct_step_bench.py

NOTE (post-hoc correction): the "pallas" variants here set only
use_pallas=True, which PoseNet3D ignores when train=True — they measured
the XLA decode. The honest train-path comparison (use_pallas_train) lives
in direct_step_bench3.py; this script is kept for the scan/donation
variants only.
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
    frames1 = jnp.asarray(
        rng.integers(0, 256, (K1, B, HW, HW, 3), dtype=np.uint8))
    frames2 = jnp.asarray(
        rng.integers(0, 256, (K2, B, HW, HW, 3), dtype=np.uint8))
    kp1 = jnp.asarray(rng.random((K1, B, 17, 3), np.float32) - 0.5)
    kp2 = jnp.asarray(rng.random((K2, B, 17, 3), np.float32) - 0.5)

    def measure(name, use_pallas, unroll):
        model = PoseNet3D(return_heatmap=False, use_pallas=use_pallas)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((B, HW, HW, 3)), lr=1e-3,
            optimizer="adam", weight_decay=1e-8,
        )
        step = make_direct_chunk_step(donate=False, unroll=unroll)

        def run(fr, kp):
            t0 = time.perf_counter()
            _, m = step(state, fr, kp, jax.random.key(1))
            loss = float(m["loss"])  # host fence
            return time.perf_counter() - t0, loss

        c1, loss = run(frames1, kp1)  # compile K1
        c2, _ = run(frames2, kp2)     # compile K2
        log(f"{name}: compiles {c1:.0f}s/{c2:.0f}s loss={loss:.4f}")
        t1, _ = run(frames1, kp1)
        t2, _ = run(frames2, kp2)
        per_step = (t2 - t1) / (K2 - K1)
        log(f"{name}: K{K1} {t1*1e3:.0f} ms, K{K2} {t2*1e3:.0f} ms "
            f"-> {per_step*1e3:.2f} ms/step "
            f"({B/per_step:,.0f} frames/s)")
        return per_step

    results = {}
    for name, use_pallas, unroll in [
        ("A rolled+xla", False, False),
        ("B rolled+pallas", True, False),
        ("C unrolled+xla", False, True),
        ("D unrolled+pallas", True, True),
    ]:
        try:
            results[name] = measure(name, use_pallas, unroll)
        except Exception as e:  # noqa: BLE001 — keep other variants running
            log(f"{name}: FAILED {type(e).__name__}: {e}")
    log("== summary ==")
    for k, v in results.items():
        log(f"{k}: {v*1e3:.2f} ms/step, {B/v:,.0f} frames/s")


if __name__ == "__main__":
    main()
