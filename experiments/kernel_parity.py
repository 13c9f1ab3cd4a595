"""Live-TPU parity check of every custom Pallas kernel vs its XLA
formulation (lifter megakernel, packed/seq attention, fused temporal
forward) — the quick re-verification to run after touching any kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/kernel_parity.py
"""
import sys
import numpy as np, jax, jax.numpy as jnp

def log(m): print(m, file=sys.stderr, flush=True)

# 1. megakernel lifter
from pose3d_tpu.models.lifters import JointTransformerLifter, sinusoidal_positional_embeddings
from pose3d_tpu.ops.pallas_lifter import lifter_forward_fused
m = JointTransformerLifter(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((128, 17, 2)).astype(np.float32))
p = jax.jit(lambda r, xx: m.init({"params": r}, xx, train=False))(jax.random.key(0), x)["params"]
pe = sinusoidal_positional_embeddings(17, 256)
want = np.asarray(jax.jit(lambda pp, xx: m.apply({"params": pp}, xx, train=False))(p, x))
got = np.asarray(jax.jit(lambda pp, xx: lifter_forward_fused(pp, xx, pe=pe))(p, x))
e1 = np.abs(got - want).max(); log(f"lifter megakernel parity: {e1:.4f}"); assert e1 < 5e-2

# 2. packed attention + seq attention
from pose3d_tpu.ops.pallas_attention import packed_flat_attention, seq_attention, _xla_attention_flat
# Gate note: with f32 operands the TPU matmul still rounds its inputs to
# bf16 at default precision, in the kernel AND in the XLA reference. The
# old max-subtracting kernel fed the matmul the SAME normalized
# probabilities as XLA, so both paths made identical roundings and the
# diff read artificially tight (7.5e-4). The clamp-softmax kernel rounds
# the unnormalized e instead — same per-element 2^-8 relative error, now
# decorrelated from XLA's — so the honest gate is the bf16 rounding class
# (~1e-2 max). True-math parity is pinned by the f32 CPU-interpret tests
# (tests/test_pallas_attention.py, atol 1e-5) and chip exp accuracy was
# measured at 3.8e-6 rel (ROUND3_NOTES).
qkv = jnp.asarray(rng.standard_normal((100 * 17, 3 * 256)).astype(np.float32))
want = np.asarray(jax.jit(lambda q: _xla_attention_flat(q, 17, 8))(qkv))
got = np.asarray(jax.jit(lambda q: packed_flat_attention(q, 17, 8))(qkv))
e2 = np.abs(got - want).max(); log(f"packed_flat_attention parity: {e2:.5f}"); assert e2 < 2e-2
q3 = jnp.asarray(rng.standard_normal((6, 243, 3 * 256)).astype(np.float32))
want = np.asarray(jax.jit(lambda q: _xla_attention_flat(q.reshape(-1, 768), 243, 8))(q3)).reshape(6, 243, 256)
got = np.asarray(jax.jit(lambda q: seq_attention(q, 8))(q3))
e3 = np.abs(got - want).max(); log(f"seq_attention parity: {e3:.5f}"); assert e3 < 2e-2

# 3. fused temporal forward
from pose3d_tpu.models.temporal import TemporalLifter
from pose3d_tpu.ops.pallas_stblock import temporal_forward_fused
tm = TemporalLifter(dtype=jnp.bfloat16)
xc = jnp.asarray(rng.random((2, 243, 17, 2)).astype(np.float32))
tp = jax.jit(lambda r, xx: tm.init({"params": r}, xx))(jax.random.key(1), xc)["params"]
want = np.asarray(jax.jit(lambda pp, xx: tm.apply({"params": pp}, xx))(tp, xc))
got = np.asarray(jax.jit(lambda pp, xx: temporal_forward_fused(pp, xx))(tp, xc))
e4 = np.abs(got - want).max(); log(f"temporal_forward_fused parity: {e4:.4f}"); assert e4 < 5e-2

# 4. fused TRAIN forward + gradient contraction (round 3: Pallas fwd+bwd
# sub-block kernels; full grad-tree parity is in
# tests/test_pallas_stblock_train.py on CPU interpret)
from pose3d_tpu.ops.pallas_stblock_train import temporal_train_forward_fused
y_t = jnp.asarray(rng.random((2, 243, 17, 3)).astype(np.float32))
def loss_flax(pp, xx):
    return jnp.mean((tm.apply({"params": pp}, xx, train=True) - y_t) ** 2)
def loss_fused(pp, xx):
    return jnp.mean((temporal_train_forward_fused(pp, xx) - y_t) ** 2)
lw, gw = jax.jit(jax.value_and_grad(loss_flax))(tp, xc)
lg, gg = jax.jit(jax.value_and_grad(loss_fused))(tp, xc)
e5 = abs(float(lg) - float(lw))
log(f"fused-train loss parity: {e5:.5f} (flax {float(lw):.5f})"); assert e5 < 5e-3
flat_w = jax.tree_util.tree_leaves(gw); flat_g = jax.tree_util.tree_leaves(gg)
rels = [float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        for a, b in zip(flat_g, flat_w)]
e6 = max(rels)
log(f"fused-train grad parity (max rel-of-max over leaves): {e6:.4f}")
assert e6 < 0.15  # bf16 grads, different accumulation orders
# 5. fused 1x1-conv + soft-argmax decode (round 4) vs the XLA composition
from pose3d_tpu.ops.heatmap import soft_argmax_3d_nhwc
from pose3d_tpu.ops.pallas_conv_decode import conv_soft_argmax_3d_fused
fe = jnp.asarray(rng.random((4, 64, 64, 256)).astype(np.float32), jnp.bfloat16)
ck = jnp.asarray((rng.standard_normal((256, 17 * 64)) * 0.05).astype(np.float32), jnp.bfloat16)
cb = jnp.asarray((rng.standard_normal(17 * 64) * 0.1).astype(np.float32), jnp.bfloat16)
want = np.asarray(jax.jit(lambda f, k, b: soft_argmax_3d_nhwc(
    f.astype(jnp.float32) @ k.astype(jnp.float32) + b.astype(jnp.float32), 17, 64))(fe, ck, cb))
got = np.asarray(jax.jit(lambda f, k, b: conv_soft_argmax_3d_fused(f, k, b, 17, 64))(fe, ck, cb))
e7 = np.abs(got - want).max(); log(f"conv+decode fused parity: {e7:.4f}"); assert e7 < 5e-2
gcot = jnp.asarray(rng.standard_normal((4, 51)).astype(np.float32))
gw = jax.jit(jax.grad(lambda f: jnp.vdot(soft_argmax_3d_nhwc(
    f.astype(jnp.float32) @ ck.astype(jnp.float32) + cb.astype(jnp.float32), 17, 64), gcot)))(fe)
gg = jax.jit(jax.grad(lambda f: jnp.vdot(conv_soft_argmax_3d_fused(f, ck, cb, 17, 64), gcot)))(fe)
e8 = float(jnp.abs(gg.astype(jnp.float32) - gw.astype(jnp.float32)).max())
log(f"conv+decode fused dfeats parity: {e8:.5f}"); assert e8 < 5e-2
log("ALL KERNEL PARITIES OK")
