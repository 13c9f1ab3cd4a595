"""Component split + batch ladder of the direct R50+64^3 train step.

VERDICT r3 item 2: direct_train's last driver number is 1,240 frames/s at
B=64 (2.48x the reference's GTX 1080 Ti) at 30.9% MFU — the weakest multiple
in the repo, with no component attribution. This script produces the
serving_profile-style split so the next move is evidence-driven:

  A. full train step (make_direct_chunk_step) at B in {64, 128, 256}
     (bf16 model) — the batch ladder past 64
  B. component fwd+bwd split at B=64 bf16:
       backbone (R50)            — fwd, and fwd+bwd wrt params
       deconv head               — fwd+bwd on fabricated (B,8,8,2048) feats
       decode XLA (NHWC)         — fwd+bwd on fabricated (B,64,64,1088)
       decode Pallas pair kernel — same logits, use_pallas_train route
       full model fwd+bwd        — cross-check vs sum of parts
       optimizer-only            — apply fixed grads (Adam + BN swap)
  C. f32 full step at B=64 — the bf16-end-to-end sanity delta

All timings two-K fenced-scan (bench.py methodology); MFU from XLA's own
cost model where available.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/direct_profile.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

HW = 256
B = 64            # component-split batch
LADDER = (64, 128, 256)
K1, K2 = 3, 9
V5E_BF16_PEAK = 197e12


def log(m):
    print(m, file=sys.stderr, flush=True)


def two_k(make_chain, *args, k1=K1, k2=K2, repeats=3):
    c1 = make_chain(k1).lower(*args).compile()
    c2 = make_chain(k2).lower(*args).compile()

    def run(c):
        out = c(*args)
        while isinstance(out, (tuple, list)):
            out = out[-1]
        return float(np.asarray(out).ravel()[0])

    run(c1); run(c2)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter(); run(c1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(c2); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (k2 - k1))
    return best, c2


def flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])
    except Exception:
        return None


def mfu_str(fl, t):
    if not fl or t <= 0:
        return ""
    return f"  [{fl / t / 1e12:6.1f} TF/s = {fl / t / V5E_BF16_PEAK:5.1%} MFU]"


def main():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.heads import DeconvHead, PoseNet3D
    from pose3d_tpu.models.resnet import ResNet
    from pose3d_tpu.train.image_steps import make_direct_chunk_step
    from pose3d_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    log(f"backend: {jax.devices()[0]}")

    # ---------------- A. full-step batch ladder (bf16) ----------------
    step = make_direct_chunk_step(donate=True)
    for b in LADDER:
        try:
            model = PoseNet3D(return_heatmap=False, use_pallas=True,
                              dtype=jnp.bfloat16)
            state = create_train_state(
                model, jax.random.key(0), jnp.zeros((b, HW, HW, 3)), lr=1e-3)
            compiled = {}

            def chain(k, b=b, state=state):
                frames = jnp.asarray(rng.integers(
                    0, 256, (k, b, HW, HW, 3), dtype=np.uint8))
                kp = jnp.asarray(rng.random((k, b, 17, 3), np.float32) - 0.5)
                key = jax.random.key(1)
                compiled[k] = step.lower(state, frames, kp, key).compile()

                def run():
                    st = jax.tree_util.tree_map(lambda x: x.copy(), state)
                    _, m = compiled[k](st, frames, kp, key)
                    return float(m["loss"])
                return run

            r1, r2 = chain(K1), chain(K2)
            r1(); r2()
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter(); r1(); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); r2(); t2 = time.perf_counter() - t0
                best = min(best, (t2 - t1) / (K2 - K1))
            fl = flops_of(compiled[K1])
            log(f"A. full step B={b:3d}: {best*1e3:7.2f} ms "
                f"({b/best:8,.0f} frames/s){mfu_str(fl, best)}")
        except Exception as e:  # noqa: BLE001 — OOM at large B is a result
            log(f"A. full step B={b:3d}: FAILED ({type(e).__name__}: "
                f"{str(e)[:120]})")

    # ---------------- B. component split at B=64 bf16 ----------------
    dt = jnp.bfloat16
    x = jnp.asarray(rng.random((B, HW, HW, 3), np.float32))
    backbone = ResNet("resnet50", dtype=dt)
    bb_vars = jax.jit(lambda r, xx: backbone.init(r, xx, train=False))(
        jax.random.key(0), x)

    def chain_bb_fwd(k):
        @jax.jit
        def f(xx, params, bs):
            def body(xc, _):
                feats = backbone.apply(
                    {"params": params, "batch_stats": bs}, xc, train=False)
                return xc + jnp.mean(feats).astype(xc.dtype) * 1e-6, \
                    feats[0, 0, 0, 0]
            xk, s = jax.lax.scan(body, xx, None, length=k)
            return xk, s[-1]
        return f

    t, c = two_k(chain_bb_fwd, x, bb_vars["params"], bb_vars["batch_stats"])
    log(f"B. backbone fwd          : {t*1e3:7.2f} ms"
        f"{mfu_str(flops_of(c) / K2, t)}")

    def chain_bb_grad(k):
        @jax.jit
        def f(params, bs, xx):
            def body(pc, _):
                def loss(p):
                    feats, upd = backbone.apply(
                        {"params": p, "batch_stats": bs}, xx, train=True,
                        mutable=["batch_stats"])
                    return jnp.sum(feats.astype(jnp.float32) ** 2) * 1e-6
                g = jax.grad(loss)(pc)
                pc = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-6 * b.astype(a.dtype), pc, g)
                return pc, jax.tree_util.tree_leaves(g)[0].ravel()[0]
            pk, s = jax.lax.scan(body, params, None, length=k)
            return pk, s[-1]
        return f

    t, c = two_k(chain_bb_grad, bb_vars["params"], bb_vars["batch_stats"], x)
    log(f"B. backbone fwd+bwd      : {t*1e3:7.2f} ms"
        f"{mfu_str(flops_of(c) / K2, t)}")

    feats = jnp.asarray(rng.random((B, 8, 8, 2048), np.float32), dt)
    head = DeconvHead(out_channels=17 * 64, dtype=dt)
    hd_vars = jax.jit(lambda r, ff: head.init(r, ff, train=False))(
        jax.random.key(0), feats)

    def chain_head_grad(k):
        @jax.jit
        def f(params, bs, ff):
            def body(pc, _):
                def loss(p):
                    out, _ = head.apply(
                        {"params": p, "batch_stats": bs}, ff, train=True,
                        mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-9
                g = jax.grad(loss)(pc)
                pc = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-6 * b.astype(a.dtype), pc, g)
                return pc, jax.tree_util.tree_leaves(g)[0].ravel()[0]
            pk, s = jax.lax.scan(body, params, None, length=k)
            return pk, s[-1]
        return f

    t, c = two_k(chain_head_grad, hd_vars["params"], hd_vars["batch_stats"],
                 feats)
    log(f"B. deconv head fwd+bwd   : {t*1e3:7.2f} ms"
        f"{mfu_str(flops_of(c) / K2, t)}")

    # decode fwd+bwd on fabricated logits
    logits = jnp.asarray(rng.random((B, 64, 64, 17 * 64), np.float32), dt)
    from pose3d_tpu.ops.heatmap import soft_argmax_3d_nhwc

    def chain_decode(decode_fn):
        def make(k):
            @jax.jit
            def f(ll):
                def body(lc, _):
                    def loss(l2):
                        coords = decode_fn(l2)
                        return jnp.sum(coords.astype(jnp.float32) ** 2)
                    g = jax.grad(loss)(lc)
                    return lc + g.astype(lc.dtype) * 1e-4, g[0, 0, 0, 0]
                lk, s = jax.lax.scan(body, ll, None, length=k)
                return lk, s[-1]
            return f
        return make

    t, c = two_k(chain_decode(
        lambda l: soft_argmax_3d_nhwc(l, 17, 64, z_scale=2.5)), logits)
    log(f"B. decode XLA fwd+bwd    : {t*1e3:7.2f} ms"
        f"{mfu_str(flops_of(c) / K2, t)}")

    try:
        from pose3d_tpu.ops.pallas_softargmax import soft_argmax_3d_nhwc_pallas
        t, c = two_k(chain_decode(
            lambda l: soft_argmax_3d_nhwc_pallas(l, 17, 64, z_scale=2.5)),
            logits)
        log(f"B. decode Pallas fwd+bwd : {t*1e3:7.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"B. decode Pallas fwd+bwd : FAILED ({str(e)[:120]})")

    # full model fwd+bwd (no optimizer)
    model = PoseNet3D(return_heatmap=False, use_pallas=True, dtype=dt)
    mv = jax.jit(lambda r, xx: model.init(r, xx, train=False))(
        jax.random.key(0), x)
    kp = jnp.asarray(rng.random((B, 17, 3), np.float32) - 0.5)

    def chain_model_grad(k):
        @jax.jit
        def f(params, bs, xx, yy):
            def body(pc, _):
                def loss(p):
                    (coords, _), _ = model.apply(
                        {"params": p, "batch_stats": bs}, xx, train=True,
                        rngs={"dropout": jax.random.key(2)},
                        mutable=["batch_stats"])
                    return jnp.mean(
                        (coords.reshape(yy.shape) - yy) ** 2)
                g = jax.grad(loss)(pc)
                pc = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-6 * b.astype(a.dtype), pc, g)
                return pc, jax.tree_util.tree_leaves(g)[0].ravel()[0]
            pk, s = jax.lax.scan(body, params, None, length=k)
            return pk, s[-1]
        return f

    t, c = two_k(chain_model_grad, mv["params"], mv["batch_stats"], x, kp)
    log(f"B. full model fwd+bwd    : {t*1e3:7.2f} ms"
        f"{mfu_str(flops_of(c) / K2, t)}")

    # optimizer-only: fixed grads applied k times
    state = create_train_state(model, jax.random.key(0),
                               jnp.zeros((B, HW, HW, 3)), lr=1e-3)
    fixed_g = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-6,
                                     state.params)

    def chain_opt(k):
        @jax.jit
        def f(st, g):
            def body(sc, _):
                sc = sc.apply_gradients(g, sc.batch_stats)
                return sc, jax.tree_util.tree_leaves(sc.params)[0].ravel()[0]
            sk, s = jax.lax.scan(body, st, None, length=k)
            return sk, s[-1]
        return f

    t, _ = two_k(chain_opt, state, fixed_g)
    log(f"B. optimizer-only        : {t*1e3:7.2f} ms")

    # ------- B2. fused conv+decode epilogue vs unfused (B=64 bf16) -------
    from pose3d_tpu.ops.pallas_conv_decode import conv_soft_argmax_3d_fused

    kernel = jnp.asarray(rng.standard_normal((256, 17 * 64)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal(17 * 64) * 0.1, dt)
    feats64 = jnp.asarray(rng.random((B, 64, 64, 256), np.float32), dt)

    def chain_epilogue(fn):
        def make(k):
            @jax.jit
            def f(ff, kk, bb):
                def body(fc, _):
                    def loss(f2):
                        return jnp.sum(fn(f2, kk, bb).astype(jnp.float32)
                                       ** 2)
                    g = jax.grad(loss)(fc)
                    return fc + g.astype(fc.dtype) * 1e-4, g[0, 0, 0, 0]
                fk, s = jax.lax.scan(body, ff, None, length=k)
                return fk, s[-1]
            return f
        return make

    t, _ = two_k(chain_epilogue(
        lambda f, kk, bb: conv_soft_argmax_3d_fused(f, kk, bb, 17, 64)),
        feats64, kernel, bias)
    log(f"B2. fused conv+decode fwd+bwd   : {t*1e3:7.2f} ms")

    t, _ = two_k(chain_epilogue(
        lambda f, kk, bb: soft_argmax_3d_nhwc(
            f.astype(jnp.float32) @ kk.astype(jnp.float32)
            + bb.astype(jnp.float32), 17, 64)),
        feats64, kernel, bias)
    log(f"B2. XLA conv+decode fwd+bwd     : {t*1e3:7.2f} ms")

    # full train step with the fused epilogue, batch ladder
    for b in LADDER[:2]:
        try:
            model = PoseNet3D(return_heatmap=False, use_pallas=True,
                              fuse_final_conv=True, dtype=jnp.bfloat16)
            state = create_train_state(
                model, jax.random.key(0), jnp.zeros((b, HW, HW, 3)), lr=1e-3)
            compiled = {}

            def chain(k, b=b, state=state):
                frames = jnp.asarray(rng.integers(
                    0, 256, (k, b, HW, HW, 3), dtype=np.uint8))
                kp_ = jnp.asarray(rng.random((k, b, 17, 3), np.float32) - 0.5)
                key = jax.random.key(1)
                compiled[k] = step.lower(state, frames, kp_, key).compile()

                def run():
                    st = jax.tree_util.tree_map(lambda x: x.copy(), state)
                    _, m = compiled[k](st, frames, kp_, key)
                    return float(m["loss"])
                return run

            r1, r2 = chain(K1), chain(K2)
            r1(); r2()
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter(); r1(); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); r2(); t2 = time.perf_counter() - t0
                best = min(best, (t2 - t1) / (K2 - K1))
            log(f"B2. FUSED-epilogue step B={b:3d}: {best*1e3:7.2f} ms "
                f"({b/best:8,.0f} frames/s)")
        except Exception as e:  # noqa: BLE001
            log(f"B2. FUSED-epilogue step B={b:3d}: FAILED "
                f"({type(e).__name__}: {str(e)[:120]})")

    # ---------------- C. f32 full step at B=64 ----------------
    model32 = PoseNet3D(return_heatmap=False, use_pallas=True,
                        dtype=jnp.float32)
    state32 = create_train_state(model32, jax.random.key(0),
                                 jnp.zeros((B, HW, HW, 3)), lr=1e-3)
    compiled = {}

    def chain32(k):
        frames = jnp.asarray(rng.integers(
            0, 256, (k, B, HW, HW, 3), dtype=np.uint8))
        kp_ = jnp.asarray(rng.random((k, B, 17, 3), np.float32) - 0.5)
        key = jax.random.key(1)
        compiled[k] = step.lower(state32, frames, kp_, key).compile()

        def run():
            st = jax.tree_util.tree_map(lambda v: v.copy(), state32)
            _, m = compiled[k](st, frames, kp_, key)
            return float(m["loss"])
        return run

    r1, r2 = chain32(K1), chain32(K2)
    r1(); r2()
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); r1(); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); r2(); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (K2 - K1))
    log(f"C. full step f32 B={B}   : {best*1e3:7.2f} ms "
        f"({B/best:8,.0f} frames/s)")


if __name__ == "__main__":
    main()
