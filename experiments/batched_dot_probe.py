"""Spatial-attention kernel variants, measured on the real chip.

The spatial attention packs G frames x 17 joints into (G*17, G*17) score
tiles — 17/G of which is real work (the measured VPU tax, ROUND3_NOTES
ablation). Mosaic cannot lower a batched (F,17,17) dot_general (probed:
remote-compile HTTP 500), so the candidates below all stay 2D:

  A    packed (544,544) masked clamp-softmax        (current kernel body)
  Anoe exp -> mul ablation (how much is the exp transcendental?)
  Anom mask=None ablation (how much is the where(-inf) pass?)
  A272 ROWS=272 (score work scales with ROWS; matmul M-efficiency drops)
  STRIP dense MXU scores -> compact (544,17) strip via mask-mul+reduce,
       exp/normalize on the strip (32x less transcendental work), then
       broadcast-mask back to dense for the e@V MXU matmul
  BF16E scores cast to bf16 before exp (half-width VPU passes), f32 sum

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/batched_dot_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

J, HEADS, DH = 17, 8, 32
DIM = HEADS * DH
K1, K2 = 8, 24
TOTAL_ROWS = 544 * 122  # ~ serving B=16 spatial rows, cell-aligned for both


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pose3d_tpu.ops.pallas_attention import SCORE_CLAMP, block_diag_mask

    def packed_body(qkv, rows, *, use_exp=True, use_mask=True):
        mask = block_diag_mask(rows, J) if use_mask else None
        outs = []
        for h in range(HEADS):
            q = qkv[:, h * DH:(h + 1) * DH]
            k = qkv[:, DIM + h * DH:DIM + (h + 1) * DH]
            v = qkv[:, 2 * DIM + h * DH:2 * DIM + (h + 1) * DH]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (DH ** -0.5)
            if mask is not None:
                s = jnp.where(mask, s, -jnp.inf)
            if use_exp:
                e = jnp.exp(jnp.minimum(s, SCORE_CLAMP))
            else:
                e = jnp.maximum(s, 0.0)  # same pass count, no transcendental
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            av = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((av * r).astype(qkv.dtype))
        return jnp.concatenate(outs, axis=-1)

    def bf16e_body(qkv, rows):
        mask = block_diag_mask(rows, J)
        outs = []
        for h in range(HEADS):
            q = qkv[:, h * DH:(h + 1) * DH]
            k = qkv[:, DIM + h * DH:DIM + (h + 1) * DH]
            v = qkv[:, 2 * DIM + h * DH:2 * DIM + (h + 1) * DH]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (DH ** -0.5)
            sb = jnp.where(mask, s, -jnp.inf).astype(jnp.bfloat16)
            e = jnp.exp(jnp.minimum(sb, jnp.bfloat16(SCORE_CLAMP)))
            r = 1.0 / jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            av = jax.lax.dot_general(
                e, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((av * r).astype(qkv.dtype))
        return jnp.concatenate(outs, axis=-1)

    def strip_body(qkv, rows):
        """Dense MXU scores -> (rows, J) strip (mask-mul + F-reduce), exp
        on the strip, broadcast back to dense for the e@V matmul."""
        f = rows // J
        mask = block_diag_mask(rows, J)
        maskf = mask.astype(jnp.float32)
        outs = []
        for h in range(HEADS):
            q = qkv[:, h * DH:(h + 1) * DH]
            k = qkv[:, DIM + h * DH:DIM + (h + 1) * DH]
            v = qkv[:, 2 * DIM + h * DH:2 * DIM + (h + 1) * DH]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (DH ** -0.5)
            strip = jnp.sum((s * maskf).reshape(rows, f, J), axis=1)
            e = jnp.exp(jnp.minimum(strip, SCORE_CLAMP))  # (rows, J)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            e_dense = (jnp.tile(e, (1, f)).reshape(rows, f, J)
                       .reshape(rows, rows) * maskf)
            av = jax.lax.dot_general(
                e_dense.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append((av * r).astype(qkv.dtype))
        return jnp.concatenate(outs, axis=-1)

    def run_variant(body, name, rows):
        def kernel(qkv_ref, out_ref):
            out_ref[...] = body(qkv_ref[...], rows)

        @jax.jit
        def apply(qkv):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((TOTAL_ROWS, DIM), qkv.dtype),
                grid=(TOTAL_ROWS // rows,),
                in_specs=[pl.BlockSpec((rows, 3 * DIM), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, DIM), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(qkv)

        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            rng.standard_normal((TOTAL_ROWS, 3 * DIM)).astype(np.float32),
            jnp.bfloat16)

        def chain(k):
            @jax.jit
            def f(x):
                def step(xc, _):
                    o = apply(xc)
                    xc = xc.at[:, :DIM].add(o * jnp.bfloat16(1e-3))
                    return xc, o[0, 0]
                xk, s = jax.lax.scan(step, x, None, length=k)
                return xk, s[-1]
            return f

        try:
            c1 = chain(K1).lower(qkv).compile()
            c2 = chain(K2).lower(qkv).compile()
        except Exception as e:  # noqa: BLE001 — probe reports lowering failures
            log(f"{name}: LOWERING FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None

        def run(c):
            _, s = c(qkv)
            return float(s)

        run(c1); run(c2)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
            best = min(best, (t2 - t1) / (K2 - K1))
        log(f"{name:24s}: {best*1e3:7.3f} ms/iter")
        return apply, qkv

    a = run_variant(lambda q, r: packed_body(q, r), "A packed 544", 544)
    run_variant(lambda q, r: packed_body(q, r, use_exp=False),
                "A no-exp (relu)", 544)
    run_variant(lambda q, r: packed_body(q, r, use_mask=False),
                "A no-mask", 544)
    run_variant(lambda q, r: packed_body(q, r), "A packed 272", 272)
    st = run_variant(strip_body, "STRIP mask-mul+reduce", 544)
    bf = run_variant(bf16e_body, "BF16 exp", 544)
    if a and st:
        ya = np.asarray(a[0](a[1]), np.float32)
        ys = np.asarray(st[0](st[1]), np.float32)
        log(f"parity A vs STRIP: max abs err {np.abs(ya - ys).max():.5f}")
    if a and bf:
        ya = np.asarray(a[0](a[1]), np.float32)
        yb = np.asarray(bf[0](bf[1]), np.float32)
        log(f"parity A vs BF16E: max abs err {np.abs(ya - yb).max():.5f}")


if __name__ == "__main__":
    main()
