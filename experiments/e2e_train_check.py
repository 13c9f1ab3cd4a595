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
print("OK")
