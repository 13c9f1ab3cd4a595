"""Decompose the headline lifting-inference iter time (18.8 ms @ B=8192).

Hypothesis (ROUND2_NOTES): with 17 joint tokens, the (B, H, 17, 17) score
tensor pads 17 lanes -> 128 on TPU, so softmax + the two tiny batched
matmuls cost far more HBM traffic than their FLOPs suggest, and the
model's MFU (~13%) is attention-bound, not dense-bound.

Variants, all B=8192, bf16, two-K scan timing (bench.py methodology):
  full        — JointTransformerLifter as benched
  no-attn     — attention replaced by identity (dense path only)
  bf16-sm     — softmax kept in bf16 (no f32 upcast)
  packed-attn — scores computed with heads folded into lanes:
                einsum reordered so the 17x17 lives on (sublane, lane) as
                (17, 17*H) one matmul per... (see code)

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/lift_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

B = 8192
K1, K2 = 30, 120


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.lifters import (
        JointTransformerLifter,
        sinusoidal_positional_embeddings,
    )

    dt = jnp.bfloat16

    class Block(nn.Module):
        """TransformerBlock with switchable attention implementation."""

        dim: int = 256
        heads: int = 4
        attn: str = "full"  # full | none | bf16sm

        @nn.compact
        def __call__(self, x):
            dh = self.dim // self.heads
            y = nn.LayerNorm(dtype=dt)(x)
            if self.attn != "none":
                z = nn.LayerNorm(dtype=dt)(y)
                qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=dt)(z)
                q, k, v = jnp.split(qkv, 3, axis=-1)

                def heads(t):
                    b, n, _ = t.shape
                    return t.reshape(b, n, self.heads, dh).transpose(0, 2, 1, 3)

                q, k, v = heads(q), heads(k), heads(v)
                a = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (dh ** -0.5)
                if self.attn == "bf16sm":
                    a = nn.softmax(a, axis=-1)
                else:
                    a = nn.softmax(a.astype(jnp.float32), axis=-1).astype(dt)
                o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
                b_, _, n, _ = o.shape
                o = o.transpose(0, 2, 1, 3).reshape(b_, n, self.dim)
                x = x + nn.Dense(self.dim, use_bias=False, dtype=dt)(o)
            y = nn.LayerNorm(dtype=dt)(x)
            y = nn.Dense(4 * self.dim, dtype=dt)(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.dim, dtype=dt)(y)
            return x + y

    class Lifter(nn.Module):
        attn: str = "full"

        @nn.compact
        def __call__(self, x):
            x = x.astype(dt)
            t = nn.Dense(256, dtype=dt)(x)
            t = t + jnp.asarray(
                sinusoidal_positional_embeddings(17, 256), dtype=dt)
            for _ in range(2):
                t = Block(attn=self.attn)(t)
            y = nn.Dense(128, dtype=dt)(t)
            y = nn.relu(y)
            y = nn.Dense(3, dtype=dt)(y)
            return y.astype(jnp.float32)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, 17, 2)).astype(np.float32))

    def chain(model, params, k):
        def f(x):
            def body(kp, _):
                out = model.apply({"params": params}, kp)
                nxt = jnp.concatenate([out[..., :2], kp[..., :0]], -1)
                return nxt * 0.5 + x * 0.5, out[0, 0, 0]

            y, s = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(y[0]) + jnp.sum(s)

        return jax.jit(f)

    def apply_chain(apply_fn, k):
        def f(x):
            def body(kp, _):
                out = apply_fn(kp)
                nxt = jnp.concatenate([out[..., :2], kp[..., :0]], -1)
                return nxt * 0.5 + x * 0.5, out[0, 0, 0]

            y, s = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(y[0]) + jnp.sum(s)

        return jax.jit(f)

    def two_k(c1, c2):
        float(c1(x0))
        float(c2(x0))
        t0 = time.perf_counter(); float(c1(x0)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(c2(x0)); t2 = time.perf_counter() - t0
        return (t2 - t1) / (K2 - K1)

    # benched production model first (sanity anchor vs bench.py's 18.8 ms)
    prod = JointTransformerLifter(dtype=dt)
    pp = prod.init({"params": jax.random.key(0)}, x0, train=False)["params"]

    def prod_apply(kp):
        return prod.apply({"params": pp}, kp, train=False)

    t = two_k(apply_chain(prod_apply, K1), apply_chain(prod_apply, K2))
    log(f"production  : {t*1e3:7.3f} ms/iter ({B/t:,.0f} frames/s)")

    for name in ["full", "none", "bf16sm"]:
        m = Lifter(attn=name)
        p = m.init({"params": jax.random.key(0)}, x0)["params"]
        t = two_k(chain(m, p, K1), chain(m, p, K2))
        log(f"attn={name:7s}: {t*1e3:7.3f} ms/iter ({B/t:,.0f} frames/s)")


if __name__ == "__main__":
    main()
