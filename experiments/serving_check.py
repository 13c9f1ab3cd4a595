"""Live-TPU check of the user-facing serving APIs end to end:
LifterService fused-ViT route (guard, buckets, odd-batch padding, parity),
the heads-mismatch fallback, and lift_sequence through the fused temporal
forward on a 438-frame sequence (tail-coverage + parity vs the XLA path).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/serving_check.py
"""
import sys
import numpy as np, jax, jax.numpy as jnp

def log(m): print(m, file=sys.stderr, flush=True)

# 1. LifterService with the fused-ViT route (guard + buckets + padding)
from pose3d_tpu.models.lifters import JointTransformerLifter
from pose3d_tpu.serving import LifterService

model = JointTransformerLifter()
rng = np.random.default_rng(0)
params = model.init({"params": jax.random.key(0)},
                    jnp.zeros((4, 17, 2)), train=False)["params"]
svc = LifterService(model, params, max_batch=256)
assert svc._fn is not None
out = svc.lift(rng.random((137, 17, 2)).astype(np.float32))  # odd size -> pad
assert out.shape == (137, 17, 3) and np.isfinite(out).all()
# parity vs the plain apply
x_test = rng.random((64, 17, 2)).astype(np.float32)
ref = np.asarray(jax.jit(
    lambda p, x: model.apply({"params": p}, x, train=False)
)(params, jnp.asarray(x_test)))
got = svc.lift(x_test)
err = np.abs(got - ref).max()
log(f"LifterService fused route: odd-batch ok, parity {err:.4f}")
assert err < 5e-2

# non-default arch must fall back, not silently mis-serve
svc8 = LifterService(JointTransformerLifter(heads=8), params, max_batch=64)
out8 = svc8.lift(x_test)
log(f"heads=8 fallback route ok ({np.abs(out8).mean():.3f})")

# 2. lift_sequence through the fused temporal forward (438-frame tail case)
from pose3d_tpu.models.temporal import TemporalLifter
from pose3d_tpu.pipeline.lift import lift_sequence

tm = TemporalLifter()
tp = tm.init({"params": jax.random.key(1)},
             jnp.zeros((1, 243, 17, 2)))["params"]
kp = rng.random((438, 17, 2)).astype(np.float32) * 900
poses = lift_sequence(tp, tm, kp)
assert poses.shape == (438, 17, 3)
assert np.abs(poses[-40:]).sum() > 0, "tail frames all-zero"
# parity vs the plain apply path
poses_xla = lift_sequence(tp, tm, kp, use_pallas=False)
err = np.abs(poses - poses_xla).max()
log(f"lift_sequence fused vs xla: {err:.4f} (438 frames incl. tail)")
assert err < 5e-2
log("ALL SERVING CHECKS OK")
