"""On-chip ladder: grouped-head attention in the SERVING stblock kernels.

Round 5 ported the fused train kernels' grouped-head attention
(pallas_stblock_train.ATTN_GROUP=4 — measured 37.7->31.6 ms on the train
step) to the serving kernels (pallas_stblock.ATTN_GROUP). This ladder
measures the whole fused serving trunk (temporal_forward_fused, the
bench temporal_infer config: B=16 clips x 243 frames bf16) at
ATTN_GROUP in {None, 2, 4, 8} and prints per-iter times; the winner
becomes the module default. Also asserts on-chip parity of every
config vs the plain XLA apply first.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python experiments/serving_attn_group_ladder.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import pose3d_tpu.ops.pallas_stblock as sb
from bench import _compile_chain, _lift_chain, _two_k
from pose3d_tpu.models.temporal import TemporalLifter

B = 16


def clear():
    sb.spatial_block_fused.clear_cache()
    sb.temporal_block_fused.clear_cache()
    sb.temporal_slab_fused.clear_cache()


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    model = TemporalLifter(dtype=jnp.bfloat16)
    t = model.clip_len
    x = jnp.asarray(rng.random((B, t, 17, 2)).astype(np.float32))
    params = jax.jit(
        lambda r, xx: model.init({"params": r}, xx)
    )(jax.random.key(0), x)["params"]

    # parity reference: the bf16 flax apply on a small slice
    want = np.asarray(jax.jit(
        lambda p, xx: model.apply({"params": p}, xx))(params, x[:2]))

    results = {}
    for group in (None, 2, 4, 8):
        sb.ATTN_GROUP = group
        clear()
        label = f"g={group}"
        try:
            got = np.asarray(jax.jit(
                lambda p, xx: sb.temporal_forward_fused(p, xx)
            )(params, x[:2]))
            err = np.abs(got - want).max()
            print(f"{label}: on-chip parity vs flax bf16 apply: "
                  f"max abs err {err:.4f}", flush=True)
            assert err < 5e-2, f"{label} parity broke: {err}"

            _, runner = _compile_chain(
                _lift_chain(lambda p, kp: sb.temporal_forward_fused(p, kp)),
                params, x, label=label)
            per_iter, t1, t2 = _two_k(runner(4), runner(16), 4, 16,
                                      repeats=5)
            fps = B * t / per_iter
            print(f"{label}: {per_iter*1e3:.2f} ms/iter -> {fps:,.0f} "
                  f"frames/s", flush=True)
            results[label] = per_iter
        except Exception as e:  # noqa: BLE001 — ladder must finish
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    print("\nladder:", flush=True)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {k}: {v*1e3:.2f} ms/iter", flush=True)

    lifter_ladder()


def lifter_ladder():
    """Same question for the flagship lifter megakernel (heads 4, dh=64:
    per-head contractions already half-fill the MXU K-width, so the only
    candidate is g=2 -> K=128). Bench lifting config: B=8192 bf16."""
    import pose3d_tpu.ops.pallas_lifter as pli
    from pose3d_tpu.models.lifters import (
        JointTransformerLifter,
        sinusoidal_positional_embeddings,
    )

    rng = np.random.default_rng(0)
    model = JointTransformerLifter(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.random((8192, 17, 2)).astype(np.float32))
    params = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.key(0), x)["params"]
    pe = sinusoidal_positional_embeddings(17, 256)
    want = np.asarray(jax.jit(
        lambda p, xx: model.apply({"params": p}, xx, train=False)
    )(params, x[:64]))

    print("\nlifter megakernel:", flush=True)
    results = {}
    for group in (None, 2):
        pli.ATTN_GROUP = group
        pli._trunk.clear_cache()
        label = f"lifter g={group}"
        try:
            got = np.asarray(jax.jit(
                lambda p, xx: pli.lifter_forward_fused(p, xx, pe=pe)
            )(params, x[:64]))
            err = np.abs(got - want).max()
            print(f"{label}: parity vs flax max abs err {err:.4f}",
                  flush=True)
            assert err < 5e-2, f"{label} parity broke: {err}"

            _, runner = _compile_chain(
                _lift_chain(lambda p, kp: pli.lifter_forward_fused(
                    p, kp, pe=pe)),
                params, x, label=label)
            per_iter, t1, t2 = _two_k(runner(30), runner(180), 30, 180,
                                      repeats=5)
            print(f"{label}: {per_iter*1e3:.3f} ms/iter -> "
                  f"{8192 / per_iter:,.0f} frames/s", flush=True)
            results[label] = per_iter
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {k}: {v*1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
