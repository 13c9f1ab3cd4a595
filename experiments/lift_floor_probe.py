"""Floor analysis for the flagship lifting megakernel (42% MFU).

The headline lifting record (5.47 ms @ B=8192 -> 1.50M frames/s) sits at
~42% MFU. This probe measures where the other 58% goes by ablating the
kernel's non-matmul work in place (every variant keeps the same pallas
grid/BlockSpecs, so the dense-matmul core and HBM schedule are held
fixed):

  full     — the shipping kernel (baseline)
  no-attn  — _packed_attention replaced by a (ROWS,768)->(ROWS,256) slice
             (drops the per-head chunked score/AV matmuls + softmax)
  no-gelu  — erf-GELU replaced by identity (VPU polynomial + exp)
  no-ln    — LayerNorm replaced by scale-and-shift only (drops the f32
             mean/var reductions; keeps the dtype round-trips)
  raw-mm   — all three at once: the dense-matmul skeleton alone

Timing: bench.py's identical-executable two-K methodology (runtime trip
counts, median of repeats). Parity is intentionally broken by the
ablations; a checksum is printed only to keep XLA from DCE-ing the run.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python experiments/lift_floor_probe.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

B = 8192
K1, K2 = 30, 120
REPEATS = 5


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import pose3d_tpu.ops.pallas_attention as pa
    import pose3d_tpu.ops.pallas_lifter as pli
    from bench import _compile_chain, _lift_chain, _two_k
    from pose3d_tpu.models.lifters import (
        JointTransformerLifter,
        sinusoidal_positional_embeddings,
    )

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    model = JointTransformerLifter(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((B, 17, 2)).astype(np.float32))
    params = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.key(0), x)["params"]
    pe = sinusoidal_positional_embeddings(17, 256)

    real_ln = pli._ln
    real_gelu = pli._gelu
    real_attn = pli._packed_attention

    def no_attn(qkv, mask):
        # same output shape/dtype as attention, zero score/softmax work
        del mask
        return qkv[:, : pli.DIM]

    def no_gelu(xx):
        return xx

    def no_ln(xx, g, b):
        # keep the f32 affine + dtype round-trip, drop the reductions
        xf = xx.astype(jnp.float32)
        return (xf * g.astype(jnp.float32)
                + b.astype(jnp.float32)).astype(xx.dtype)

    variants = [
        ("full", {}),
        ("no-attn", {"_packed_attention": no_attn}),
        ("no-gelu", {"_gelu": no_gelu}),
        ("no-ln", {"_ln": no_ln}),
        ("raw-mm", {"_packed_attention": no_attn, "_gelu": no_gelu,
                    "_ln": no_ln}),
    ]

    results = {}
    for label, patches in variants:
        for name, fn in patches.items():
            setattr(pli, name, fn)
        pli._trunk.clear_cache()
        try:
            _, runner = _compile_chain(
                _lift_chain(lambda p, kp: pli.lifter_forward_fused(
                    p, kp, pe=pe)),
                params, x, label=label)
            per_iter, t1, t2 = _two_k(runner(K1), runner(K2), K1, K2,
                                      repeats=REPEATS)
            log(f"{label}: {per_iter*1e3:.3f} ms/iter "
                f"({B/per_iter:,.0f} frames/s)")
            results[label] = per_iter * 1e3
        except Exception as e:  # noqa: BLE001 — ladder must finish
            log(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        finally:
            pli._ln = real_ln
            pli._gelu = real_gelu
            pli._packed_attention = real_attn
    pli._trunk.clear_cache()

    if "full" in results:
        base = results["full"]
        log("\nshares of the full iter:")
        for label, ms in results.items():
            if label == "full":
                continue
            log(f"  {label}: {ms:.3f} ms -> ablated work = "
                f"{base - ms:+.3f} ms ({(base - ms) / base * 100:.1f}%)")
    del pa  # imported for documentation symmetry; seams live in pli


if __name__ == "__main__":
    main()
