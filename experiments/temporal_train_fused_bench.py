"""Temporal TRAIN step: fused Pallas fwd+bwd sub-blocks vs XLA (round 3).

Two-K fenced methodology (bench.py docstring). B=8, 243-frame clips, bf16.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.models.temporal import TemporalLifter
from pose3d_tpu.ops.pallas_stblock_train import make_fused_train_apply
from pose3d_tpu.train.epoch import make_lifter_epoch_fn
from pose3d_tpu.train.state import create_train_state

B = 8
K1, K2 = 4, 12

rng = np.random.default_rng(0)
model = TemporalLifter(dtype=jnp.bfloat16)
t = model.clip_len
state = create_train_state(model, jax.random.key(0),
                           jnp.zeros((B, t, 17, 2)), lr=1e-3)


def measure(st, label):
    epoch_fn = make_lifter_epoch_fn(donate=False)
    compiled = {}

    def runner(k):
        y1 = jnp.asarray(rng.random((k, B, t, 17, 2), np.float32))
        y2 = jnp.asarray(rng.random((k, B, t, 17, 3), np.float32) - 0.5)
        key = jax.random.key(1)
        compiled[k] = epoch_fn.lower(st, y1, y2, key).compile()

        def run():
            _, m = compiled[k](st, y1, y2, key)
            return float(m["loss"])
        return run

    r1, r2 = runner(K1), runner(K2)
    l1, l2 = r1(), r2()
    print(f"{label}: losses {l1:.5f} / {l2:.5f}")
    # round-5 estimator: medians per chain (bench.py methodology note)
    t1s, t2s = [], []
    for _ in range(7):
        t0 = time.perf_counter(); r1(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); r2(); t2s.append(time.perf_counter() - t0)
    per = (np.median(t2s) - np.median(t1s)) / (K2 - K1)
    deltas = [round((b - a) / (K2 - K1) * 1e3, 2) for a, b in zip(t1s, t2s)]
    print(f"{label}: median {per*1e3:.2f} ms/step -> {B*t/per:,.0f} frames/s"
          f" (deltas ms: {deltas})")
    return per, l2


fused_state = state.replace(apply_fn=make_fused_train_apply())
fused, lf = measure(fused_state, "fused")
xla, lx = measure(state, "xla")
print(f"speedup: {xla/fused:.2f}x; loss delta {abs(lf-lx):.5f}")
