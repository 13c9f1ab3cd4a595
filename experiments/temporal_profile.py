"""Where does temporal-lifter INFERENCE time go? (serving path)

Variants (B=16, T=243, dim 256, heads 8, 5 blocks, bf16, two-K scan):
  full        — as shipped
  no-spatial  — spatial MHSA replaced by identity (keeps its LN+MLP)
  no-temporal — temporal MHSA replaced by identity
  no-attn     — both replaced (dense-only floor)

The deltas attribute time to each attention half, isolating the padded
seq-17 score cost from the seq-243 one.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/temporal_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

B = 16
K1, K2 = 8, 24


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    dt = jnp.bfloat16
    DIM, HEADS, BLOCKS, T, J = 256, 8, 5, 243, 17

    class MHSA(nn.Module):
        skip: bool

        @nn.compact
        def __call__(self, x):
            if self.skip:
                return x
            d = DIM // HEADS
            qkv = nn.Dense(3 * DIM, dtype=dt)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def sh(tn):
                n, l, _ = tn.shape
                return tn.reshape(n, l, HEADS, d).transpose(0, 2, 1, 3)

            q, k, v = sh(q), sh(k), sh(v)
            a = jnp.einsum("nhld,nhmd->nhlm", q, k) * (d ** -0.5)
            a = nn.softmax(a.astype(jnp.float32), axis=-1).astype(dt)
            o = jnp.einsum("nhlm,nhmd->nhld", a, v)
            n, _, l, _ = o.shape
            o = o.transpose(0, 2, 1, 3).reshape(n, l, DIM)
            return nn.Dense(DIM, dtype=dt)(o)

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Dense(4 * DIM, dtype=dt)(x)
            y = nn.gelu(y, approximate=False)
            return nn.Dense(DIM, dtype=dt)(y)

    class Block(nn.Module):
        skip_s: bool
        skip_t: bool

        @nn.compact
        def __call__(self, x):
            b, t, j, c = x.shape
            xs = x.reshape(b * t, j, c)
            xs = xs + MHSA(self.skip_s)(nn.LayerNorm(dtype=dt)(xs))
            xs = xs + MLP()(nn.LayerNorm(dtype=dt)(xs))
            x = xs.reshape(b, t, j, c)
            xt = x.transpose(0, 2, 1, 3).reshape(b * j, t, c)
            xt = xt + MHSA(self.skip_t)(nn.LayerNorm(dtype=dt)(xt))
            xt = xt + MLP()(nn.LayerNorm(dtype=dt)(xt))
            return xt.reshape(b, j, t, c).transpose(0, 2, 1, 3)

    class Model(nn.Module):
        skip_s: bool = False
        skip_t: bool = False

        @nn.compact
        def __call__(self, x):
            x = nn.Dense(DIM, dtype=dt)(x.astype(dt))
            for _ in range(BLOCKS):
                x = Block(self.skip_s, self.skip_t)(x)
            return nn.Dense(3, dtype=dt)(nn.LayerNorm(dtype=dt)(x)).astype(
                jnp.float32)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, T, J, 2)).astype(np.float32))

    def two_k(model, params):
        def chain(k):
            @jax.jit
            def f(p, x):
                def body(kp, _):
                    out = model.apply({"params": p}, kp)
                    return kp + out[..., :2] * 1e-3, out[0, 0, 0, 0]

                kp, s = jax.lax.scan(body, x, None, length=k)
                return kp, s[-1]

            return f

        c1 = chain(K1).lower(params, x0).compile()
        c2 = chain(K2).lower(params, x0).compile()

        def run(c):
            _, s = c(params, x0)
            return float(s)

        run(c1); run(c2)
        t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
        return (t2 - t1) / (K2 - K1)

    for name, ks, kt in [("full", False, False), ("no-spatial", True, False),
                         ("no-temporal", False, True), ("no-attn", True, True)]:
        m = Model(skip_s=ks, skip_t=kt)
        p = m.init({"params": jax.random.key(0)}, x0)["params"]
        t = two_k(m, p)
        log(f"{name:12s}: {t*1e3:7.2f} ms/iter ({B*T/t:9,.0f} frames/s)")


if __name__ == "__main__":
    main()
