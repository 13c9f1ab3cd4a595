"""Temporal-lifter train-step throughput: batch scaling + MFU.

bench.py measures B=8 (33.8k frames/s). Hypothesis: the step is dispatch/
layout-bound at that size — the spatial attention runs at sequence length
17 (the same (17,17)->(32,128) score-tile padding the megakernel dodges)
and B*T*17 tokens only fill the MXU at larger B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/temporal_bench.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

K1, K2 = 4, 12
V5E_BF16_PEAK = 197e12


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.train.epoch import make_lifter_epoch_fn
    from pose3d_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    model = TemporalLifter(dtype=jnp.bfloat16)
    t = model.clip_len
    epoch_fn = make_lifter_epoch_fn(donate=False)

    for b in (8, 32, 64):
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((b, t, 17, 2)), lr=1e-3)

        compiled = {}

        def runner(k, b=b, state=state, compiled=compiled):
            y1 = jnp.asarray(rng.random((k, b, t, 17, 2), np.float32))
            y2 = jnp.asarray(rng.random((k, b, t, 17, 3), np.float32) - 0.5)
            key = jax.random.key(1)
            compiled[k] = epoch_fn.lower(state, y1, y2, key).compile()

            def run():
                _, m = compiled[k](state, y1, y2, key)
                return float(m["loss"])

            return run

        r1, r2 = runner(K1), runner(K2)
        r1(); r2()
        t0 = time.perf_counter(); r1(); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); r2(); t2 = time.perf_counter() - t0
        per = (t2 - t1) / (K2 - K1)
        try:
            ca = compiled[K1].cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = float(ca["flops"])
        except Exception:
            fl = 0.0
        tf = fl / per / 1e12 if fl else 0.0
        log(f"B={b:3d}: {per*1e3:7.2f} ms/step  {b*t/per:9,.0f} frames/s  "
            f"{tf:6.1f} TF/s ({tf*1e12/V5E_BF16_PEAK*100:4.1f}% peak)")


if __name__ == "__main__":
    main()
