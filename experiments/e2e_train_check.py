"""Quick live-chip sanity: 40 Martinez train steps on synthetic data must
drop the loss >2x (the /verify recipe step 3).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/e2e_train_check.py
"""
import jax, jax.numpy as jnp, numpy as np
from pose3d_tpu.data.synthetic import synthetic_h36m
from pose3d_tpu.models.lifters import MartinezLifter
from pose3d_tpu.train.state import create_train_state
from pose3d_tpu.train.steps import make_lifter_train_step

kp2d, kp3d = synthetic_h36m(2048)
kp2d, kp3d = jnp.asarray(kp2d), jnp.asarray(kp3d)
state = create_train_state(MartinezLifter(), jax.random.key(0), jnp.zeros((64,17,2)), lr=1e-3)
step = make_lifter_train_step(donate=False)
losses = []
for i in range(40):
    b = slice((i*64) % 2048, (i*64) % 2048 + 64)
    state, m = step(state, kp2d[b], kp3d[b], jax.random.key(i))
    if i in (0, 39): losses.append(m["loss"])
l0, l39 = float(losses[0]), float(losses[1])
print(f"e2e train on TPU: loss {l0:.5f} -> {l39:.5f} ({l0/l39:.1f}x drop)")
assert l39 < l0 / 2

# Stage 2: the temporal lifter through the FUSED Pallas fwd+bwd sub-block
# kernels (ops/pallas_stblock_train) — the backward is a hand-derived
# kernel, so convergence through it (not just one-batch grad parity) is
# the live sanity for the whole train path.
from pose3d_tpu.models.temporal import TemporalLifter
from pose3d_tpu.ops.pallas_stblock_train import make_fused_train_apply

rng = np.random.default_rng(0)
t = 243
model = TemporalLifter(dtype=jnp.bfloat16)
tstate = create_train_state(model, jax.random.key(1),
                            jnp.zeros((4, t, 17, 2)), lr=3e-4)
tstate = tstate.replace(apply_fn=make_fused_train_apply())
# learnable synthetic mapping: 3d = broadcast of 2d + fixed offset
x = jnp.asarray(rng.random((4, t, 17, 2), np.float32))
y = jnp.concatenate([x * 0.8, x[..., :1] * 0.3 + 0.1], axis=-1)
tl = []
for i in range(30):
    tstate, m = step(tstate, x, y, jax.random.key(100 + i))
    if i in (0, 29): tl.append(m["loss"])
t0, t29 = float(tl[0]), float(tl[1])
print(f"fused temporal train on TPU: loss {t0:.5f} -> {t29:.5f} "
      f"({t0/t29:.1f}x drop)")
assert t29 < t0 / 2
print("OK")
