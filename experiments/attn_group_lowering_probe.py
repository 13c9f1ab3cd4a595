"""Isolate which ingredient of the grouped-head attention Mosaic rejects.

attn_group_probe showed every ATTN_GROUP variant failing remote-compile
(HTTP 500) while interpret-mode parity passes on CPU. Candidates, probed
one kernel each with FULL error text:

  A tile        — jnp.tile(x, (g, 1)) sublane-dim tile
  B iota_masks  — the three static selector matrices
  C segsum3d    — (g*C, g*dh) -> reshape (g, C, g*dh) -> sum(axis=0)
  D fwd         — grouped_heads_attention forward alone
  E bwd         — grouped_attention_chunk_bwd alone

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/attn_group_lowering_probe.py
"""

from __future__ import annotations

import functools
import sys
import traceback

import numpy as np

C, HEADS, DH, G = 136, 8, 32, 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pose3d_tpu.ops import pallas_attention as pa

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((C, 3 * HEADS * DH)), jnp.bfloat16)
    datt = jnp.asarray(rng.standard_normal((C, HEADS * DH)), jnp.bfloat16)

    def run_kernel(name, body, out_cols, *operands):
        def kernel(*refs):
            out_ref = refs[-1]
            out_ref[...] = body(*[r[...] for r in refs[:-1]])

        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((C, out_cols), jnp.bfloat16),
                in_specs=[pl.BlockSpec(o.shape, lambda: (0,) * o.ndim,
                                       memory_space=pltpu.VMEM)
                          for o in operands],
                out_specs=pl.BlockSpec((C, out_cols), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
            )(*operands)
            out.block_until_ready()
            log(f"{name}: OK ({np.asarray(out[:1, :1])})")
        except Exception:
            tb = traceback.format_exc()
            log(f"{name}: FAILED\n{tb[-2500:]}\n----")

    # A: sublane tile
    run_kernel(
        "A tile", lambda x: jnp.tile(x[:, :G * DH], (G, 1))[:C].astype(
            jnp.bfloat16), G * DH, qkv)

    # B: iota masks
    def masks(x):
        lane = pa._lane_block_mask(G, C, DH, jnp.float32)
        seg = pa._seg_sum_matrix(G, C, jnp.float32)
        exp = pa._lane_expand_matrix(G, DH, jnp.float32)
        v = (jnp.sum(lane) + jnp.sum(seg) + jnp.sum(exp))
        return (x[:, :G * DH].astype(jnp.float32)
                + v).astype(jnp.bfloat16)

    run_kernel("B iota_masks", masks, G * DH, qkv)

    # C: stacked 3d segsum
    def segsum(x):
        big = jnp.tile(x[:, :G * DH], (G, 1)).astype(jnp.float32)
        return jnp.sum(big.reshape(G, C, G * DH), axis=0).astype(jnp.bfloat16)

    run_kernel("C segsum3d", segsum, G * DH, qkv)

    # D: grouped forward
    run_kernel(
        "D fwd", lambda x: pa.grouped_heads_attention(x, 17, HEADS, DH, G),
        HEADS * DH, qkv)

    # E: grouped backward
    def bwd(x, g_):
        return pa.grouped_attention_chunk_bwd(
            x, g_, 17, HEADS, DH, G).astype(jnp.bfloat16)

    run_kernel("E bwd", bwd, 3 * HEADS * DH, qkv, datt)


if __name__ == "__main__":
    main()
