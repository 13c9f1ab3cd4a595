"""On-chip ablation of the fused temporal-TRAIN kernels (round 4).

temporal_train_split measured spatial x5 = 18.6 ms and temporal x5 =
17.4 ms of the 37.5 ms step — the two kernel halves ARE the step, and
both sit far above their dense-matmul speed-of-light (~4 ms each, bf16).
This probe finds where the time actually goes by monkeypatching one
ingredient out at a time (the kernels re-trace under each fresh jit, so
a patched module global takes effect inside the Pallas body):

  base      — shipped kernel
  fwd_only  — forward impl alone (no custom_vjp backward)
  no_attn   — attention replaced by a v-passthrough fwd / zero-pad bwd
              (removes score matmuls AND all score-tile VPU passes)
  no_exp    — score_exp -> clamp only (keeps every pass, drops the
              transcendental; patched in BOTH fwd and bwd)
  no_gelu   — gelu -> identity, gelu' -> 1 (removes the erf/exp VPU work
              on the (rows, 1024) MLP activations)
  no_ln     — LayerNorm -> identity stats (removes the f32 mean/var/
              rsqrt passes and their backward)

All variants change numerics — they are TIMING probes only; parity is
pinned by tests/test_pallas_stblock_train.py and kernel_parity.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/train_kernel_ablation.py
"""

from __future__ import annotations

import contextlib
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
    b1 = b2 = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); run(c1); b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); run(c2); b2 = min(b2, time.perf_counter() - t0)
    per = (b2 - b1) / (K2 - K1)
    return per if per > 0 else b2 / K2


@contextlib.contextmanager
def patched(*patches):
    """patches: (module, attr, replacement) triples; restored on exit."""
    saved = [(m, a, getattr(m, a)) for m, a, _ in patches]
    for m, a, r in patches:
        setattr(m, a, r)
    try:
        yield
    finally:
        for m, a, v in saved:
            setattr(m, a, v)


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops import pallas_attention as pa
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

    def chain_spatial_fwd(k):
        @jax.jit
        def f(x, g, *w5):
            def body(xc, _):
                xx = xc
                for w in w5:
                    xx, _ = st._spatial_fwd_impl(xx, w, False)
                return xc + xx * jnp.bfloat16(1e-4), xx[0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    def chain_temporal_fwd(k):
        @jax.jit
        def f(x, g, *w5):
            def body(xc, _):
                xx = xc
                for w in w5:
                    xx, _ = st._temporal_slab_fwd_impl(xx, w, False)
                return xc + xx * jnp.bfloat16(1e-4), xx[0, 0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    # ---- ablation patches
    def attn_fwd_off(qkv, seq):
        dim = qkv.shape[-1] // 3
        return qkv[:, 2 * dim:]

    def attn_bwd_off(qkv, datt, seq, dt):
        z = jnp.zeros_like(datt)
        return jnp.concatenate([z, z, datt], axis=-1)

    def exp_off(s):
        return jnp.minimum(s, pa.SCORE_CLAMP) + jnp.float32(1.0)

    def ln_stats_off(x):
        xf = x.astype(jnp.float32)
        return xf, jnp.ones(x.shape[:-1] + (1,), jnp.float32)

    variants = [
        ("base", []),
        ("no_attn", [(st, "_attention_fwd", attn_fwd_off),
                     (st, "_attention_bwd", attn_bwd_off)]),
        ("no_exp", [(st, "score_exp", exp_off),
                    (pa, "score_exp", exp_off)]),
        ("no_gelu", [(st, "_gelu", lambda x: x),
                     (st, "_gelu_grad",
                      lambda x: jnp.ones(x.shape, jnp.float32))]),
        ("no_ln", [(st, "_ln_fwd_stats", ln_stats_off),
                   (st, "_ln_bwd_input", lambda dy, xhat, r: dy)]),
    ]

    for name, chain, args in (
            ("spatial ", chain_spatial, (rows, grows, *sw)),
            ("temporal", chain_temporal, (slab, gslab, *tw))):
        fwd_chain = chain_spatial_fwd if name.startswith("spa") \
            else chain_temporal_fwd
        try:
            t = two_k(fwd_chain, *args)
            log(f"{name} x5 fwd only           : {t*1e3:7.2f} ms")
        except Exception as e:
            log(f"{name} x5 fwd only           : FAILED "
                f"({type(e).__name__}: {str(e)[:100]})")
        for label, patches in variants:
            try:
                with patched(*patches):
                    t = two_k(chain, *args)
                log(f"{name} x5 fwd+grad {label:>8s}: {t*1e3:7.2f} ms")
            except Exception as e:
                log(f"{name} x5 fwd+grad {label:>8s}: FAILED "
                    f"({type(e).__name__}: {str(e)[:100]})")


if __name__ == "__main__":
    main()
