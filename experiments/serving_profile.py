"""Piece-wise profile of temporal_forward_fused at serving batch B=16.

Times each component of the fused serving forward separately (two-K scan
method, real chip) so the remaining gap to the FLOP bound is attributable:

  - 5x spatial_block_fused on (C*T*17, 256) flat rows
  - 5x temporal_block_fused on (C*17, T, 256) sequences
  - 10x the inter-branch (C,T,17,D)<->(C,17,T,D) transposes
  - embed+PE and head glue
  - the full temporal_forward_fused chain (cross-check: sum of parts)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/serving_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

C, T, J, D = 16, 243, 17, 256
K1, K2 = 4, 12


def log(m):
    print(m, file=sys.stderr, flush=True)


def two_k(make_chain, *args):
    c1 = make_chain(K1).lower(*args).compile()
    c2 = make_chain(K2).lower(*args).compile()

    def run(c):
        out = c(*args)
        return float(out if not isinstance(out, tuple) else out[-1])

    run(c1); run(c2)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (K2 - K1))
    return best


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops.pallas_stblock import (
        pack_spatial_weights,
        pack_temporal_weights,
        spatial_block_fused,
        temporal_block_fused,
        temporal_forward_fused,
    )

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((C, T, J, 2)).astype(np.float32))
    model = TemporalLifter(dtype=jnp.bfloat16)
    params = model.init({"params": jax.random.key(0)}, x0[:2])["params"]
    sw = [pack_spatial_weights(params[f"SpatioTemporalBlock_{b}"])
          for b in range(5)]
    tw = [pack_temporal_weights(params[f"SpatioTemporalBlock_{b}"])
          for b in range(5)]

    rows = jnp.asarray(
        rng.random((C * T * J, D)).astype(np.float32), jnp.bfloat16)
    seqs = jnp.asarray(
        rng.random((C * J, T, D)).astype(np.float32), jnp.bfloat16)

    def chain_spatial(k):
        @jax.jit
        def f(x, *w5):
            def body(xc, _):
                for w in w5:
                    xc = spatial_block_fused(xc, w)
                return xc * (1.0 / (1.0 + 4e-3)), xc[0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    def chain_temporal(k):
        @jax.jit
        def f(x, *w5):
            def body(xc, _):
                for w in w5:
                    xc = temporal_block_fused(xc, w)
                return xc * (1.0 / (1.0 + 4e-3)), xc[0, 0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    def chain_transpose(k):
        @jax.jit
        def f(x):
            def body(xc, _):
                for _ in range(5):
                    xt = xc.reshape(C, T, J, D).transpose(0, 2, 1, 3) \
                        .reshape(C * J, T, D)
                    # force materialization between the two transposes the
                    # way the real chain does (a kernel sits between them)
                    xt = xt + jnp.bfloat16(1e-3)
                    xc = xt.reshape(C, J, T, D).transpose(0, 2, 1, 3) \
                        .reshape(C * T * J, D)
                return xc, xc[0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    def chain_full(k):
        @jax.jit
        def f(p, x):
            def body(xc, _):
                out = temporal_forward_fused(p, xc)
                return xc + out[..., :2] * 1e-3, out[0, 0, 0, 0]
            xk, s = jax.lax.scan(body, x, None, length=k)
            return xk, s[-1]
        return f

    t_sp = two_k(chain_spatial, rows, *sw)
    log(f"5x spatial_block_fused : {t_sp*1e3:7.2f} ms")
    t_tp = two_k(chain_temporal, seqs, *tw)
    log(f"5x temporal_block_fused: {t_tp*1e3:7.2f} ms")
    t_tr = two_k(chain_transpose, rows)
    log(f"10x transposes         : {t_tr*1e3:7.2f} ms")
    t_full = two_k(chain_full, params, x0)
    log(f"full fused forward     : {t_full*1e3:7.2f} ms "
        f"({C*T/t_full:,.0f} frames/s)")
    log(f"sum of parts {1e3*(t_sp+t_tp+t_tr):.2f} ms -> glue "
        f"{1e3*(t_full-t_sp-t_tp-t_tr):.2f} ms")


if __name__ == "__main__":
    main()
