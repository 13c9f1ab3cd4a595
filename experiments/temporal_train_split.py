"""Component split of the fused temporal TRAIN step (real chip).

VERDICT r3 item 3 wants the MFU climb continued on evidence. Today's
train_bwd_ladder re-measured the spatial fwd+bwd chain at 18.3 ms of the
37.5 ms step; this probe measures the missing half in the same window:

  spatial x5   — 5 spatial_block_train fwd+grad on (B*T*17, 256) rows
  temporal x5  — 5 temporal_slab_train fwd+grad on the (B, T, 17*256) slab
  full fwd+bwd — grad of temporal_train_forward_fused (kernels + glue)
  optimizer    — epoch-fn minus the grad: adam update on the param tree

glue = full - spatial - temporal; the biggest term is the next target.
The temporal half's hypothesis: 17 joints x 8 heads = 136 (243,243)
score tiles per clip -> the f32 VPU exp/mask passes dominate, same class
as the spatial ablation (ROUND3_NOTES "score-tile VPU work dominates").

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/temporal_train_split.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

B, T, J, D = 8, 243, 17, 256
K1, K2 = 4, 12


def log(m):
    print(m, file=sys.stderr, flush=True)


def two_k(make_chain, *args):
    c1 = make_chain(K1).lower(*args).compile()
    c2 = make_chain(K2).lower(*args).compile()

    def run(c):
        out = c(*args)
        while isinstance(out, (tuple, list)):
            out = out[-1]
        return float(np.asarray(out).ravel()[0])

    run(c1); run(c2)
    # best-of-N per chain, then difference (see rows_ladder.two_k_scan)
    b1 = b2 = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); run(c1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); run(c2); b2 = min(b2, time.perf_counter() - t0)
    per = (b2 - b1) / (K2 - K1)
    return per if per > 0 else b2 / K2


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops import pallas_stblock_train as st
    from pose3d_tpu.ops.pallas_stblock import (
        pack_spatial_weights,
        pack_temporal_weights,
    )

    rng = np.random.default_rng(0)
    model = TemporalLifter(dtype=jnp.bfloat16, use_pallas=False)
    x0 = jnp.asarray(rng.random((2, T, J, 2)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x0)["params"]
    sw = [pack_spatial_weights(params[f"SpatioTemporalBlock_{b}"])
          for b in range(5)]
    tw = [pack_temporal_weights(params[f"SpatioTemporalBlock_{b}"])
          for b in range(5)]

    rows = jnp.asarray(
        rng.random((B * T * J, D)).astype(np.float32), jnp.bfloat16)
    grows = jnp.asarray(
        rng.random((B * T * J, D)).astype(np.float32), jnp.bfloat16)
    slab = jnp.asarray(
        rng.random((B, T, J * D)).astype(np.float32), jnp.bfloat16)
    gslab = jnp.asarray(
        rng.random((B, T, J * D)).astype(np.float32), jnp.bfloat16)

    def chain_spatial(k):
        @jax.jit
        def f(x, g, *w5):
            def body(xc, _):
                def loss(xx):
                    for w in w5:
                        xx = st.spatial_block_train(xx, *w, False)
                    return jnp.vdot(xx.astype(jnp.float32),
                                    g.astype(jnp.float32))
                dx = jax.grad(loss)(xc)
                return xc + dx.astype(xc.dtype) * jnp.bfloat16(1e-4), dx[0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    def chain_temporal(k):
        @jax.jit
        def f(x, g, *w5):
            def body(xc, _):
                def loss(xx):
                    for w in w5:
                        xx = st.temporal_slab_train(xx, *w, False)
                    return jnp.vdot(xx.astype(jnp.float32),
                                    g.astype(jnp.float32))
                dx = jax.grad(loss)(xc)
                return xc + dx.astype(xc.dtype) * jnp.bfloat16(1e-4), \
                    dx[0, 0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    t_sp = two_k(chain_spatial, rows, grows, *sw)
    log(f"spatial  x5 fwd+grad: {t_sp*1e3:7.2f} ms")
    t_tm = two_k(chain_temporal, slab, gslab, *tw)
    log(f"temporal x5 fwd+grad: {t_tm*1e3:7.2f} ms")

    # full fused forward+backward (kernels + embed/PE/head/regroup glue)
    clips = jnp.asarray(rng.random((B, T, J, 2)).astype(np.float32))
    target = jnp.asarray(
        rng.random((B, T, J, 3)).astype(np.float32) - 0.5)

    def chain_full(k):
        @jax.jit
        def f(pp, xx, yy):
            def body(c, _):
                def loss(q):
                    out = st.temporal_train_forward_fused(q, xx)
                    return jnp.mean(
                        (out.astype(jnp.float32) - yy) ** 2)
                l, g = jax.value_and_grad(loss)(c)
                return jax.tree.map(
                    lambda a, b: a - 1e-4 * b.astype(a.dtype), c, g), l
            pk_, s = jax.lax.scan(body, pp, None, length=k)
            return pk_, s[-1]
        return f

    t_full = two_k(chain_full, params, clips, target)
    log(f"full fwd+bwd (fused): {t_full*1e3:7.2f} ms  "
        f"[glue = {(t_full - t_sp - t_tm)*1e3:5.2f} ms]")

    # optimizer-only: the train step minus the grad
    import optax
    tx = optax.adamw(1e-3)
    opt_state = jax.jit(tx.init)(params)
    fixed_g = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6, params)

    def chain_opt(k):
        @jax.jit
        def f(pp, oo, gg):
            def body(c, _):
                p, o = c
                up, o2 = tx.update(gg, o, p)
                probe = jax.tree.leaves(up)[0].ravel()[0]
                return (optax.apply_updates(p, up), o2), probe
            (pk_, ok_), s = jax.lax.scan(body, (pp, oo), None, length=k)
            return pk_, s[-1]
        return f

    t_opt = two_k(chain_opt, params, opt_state, fixed_g)
    log(f"optimizer-only (adamw): {t_opt*1e3:7.2f} ms")
    log(f"accounted: sp {t_sp*1e3:.2f} + tm {t_tm*1e3:.2f} + "
        f"glue {(t_full-t_sp-t_tm)*1e3:.2f} + opt {t_opt*1e3:.2f} "
        f"= {(t_full+t_opt)*1e3:.2f} ms vs step 37.5")


if __name__ == "__main__":
    main()
