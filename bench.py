"""Benchmarks: the three BASELINE workloads on one TPU chip, with MFU.

Workloads (BASELINE.json configs):
  1. lifting_infer   — 2D->3D transformer lifter inference (config #1/#2,
                       the headline metric; vs live torch-CPU reference)
  2. direct_train    — R50 + 64^3 volumetric soft-argmax train step, B=64
                       (config #4; vs the reference's GTX 1080 Ti ~500
                       frames/s, BASELINE.md 6.3 s/epoch @ 49x64 frames)
  3. temporal_train  — 243-frame temporal-transformer train step (config #3;
                       the reference delegates this to external MotionBERT —
                       no baseline number exists, vs_baseline is null)
  4. temporal_infer  — 243-frame serving forward through the fused
                       spatial+temporal sub-block kernels (the
                       pipeline/lift video->3D path)

stdout: exactly ONE JSON line — the headline lifting metric, with the other
workloads nested under "extra". Human-readable logs go to stderr.

Methodology (important on this tunneled-TPU environment):
- ``block_until_ready`` does NOT fence execution through the axon tunnel and
  per-call dispatch costs tens of ms, so per-call timing loops measure
  nothing. Every workload is iterated ON DEVICE inside a ``lax.scan`` (each
  iteration depends on the previous, so no step can be elided), fenced by
  materializing a scalar to host.
- Two scan lengths K1 < K2 are timed; per-iteration time is
  (t2 - t1) / (K2 - K1): tunnel round-trip and constant overhead cancel.
- FLOPs come from XLA's own cost model (compiled.cost_analysis()); the cost
  model counts a scan body once regardless of trip count, so the body count
  IS the per-iteration figure. MFU is reported against the v5e bf16 MXU
  peak.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # TPU v5e per-chip bf16 peak FLOP/s

BATCH = 8192
K1, K2 = 30, 180


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _flops(compiled):
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])
    except Exception:
        return None


def _per_iter_flops(f1, f2):
    """XLA's cost model counts a while/scan body ONCE regardless of trip
    count (verified: flops(K=3) == flops(K=10) to within epilogue noise), so
    the per-iteration FLOPs are just the body count — take the smaller of
    the two compiles to shave the epilogue."""
    vals = [f for f in (f1, f2) if f]
    return min(vals) if vals else None


def _mfu_fields(flops_per_iter, per_iter_s):
    if not flops_per_iter or per_iter_s <= 0:
        return {}
    tf = flops_per_iter / per_iter_s / 1e12
    return {"tflops": round(tf, 1),
            "mfu_vs_bf16_peak": round(tf * 1e12 / V5E_BF16_PEAK, 4)}


def _two_k(run1, run2, k1, k2):
    """Compile+warm both, then time; returns seconds per iteration."""
    run1()
    run2()
    t0 = time.perf_counter()
    run1()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run2()
    t2 = time.perf_counter() - t0
    per_iter = (t2 - t1) / (k2 - k1)
    if per_iter <= 0:  # timing noise swamped the delta; raw K2 upper bound
        per_iter = t2 / k2
    return per_iter, t1, t2


# --------------------------------------------------------------------------
# 1. lifting inference (headline)
# --------------------------------------------------------------------------

def _lift_chain(apply_fn, k):
    import jax
    from jax import lax

    def chain(params, kp):
        def body(kp, _):
            out = apply_fn(params, kp)
            # data dependence: next input derives from this output
            return kp + out[..., :2] * 1e-3, out[0, 0, 0]

        kp, samples = lax.scan(body, kp, None, length=k)
        return kp, samples[-1]

    return chain


def _lifter_flops_per_frame():
    """Analytic forward FLOPs of the default lifter (17 tokens, dim 256,
    2 blocks, heads 4, MLP 4x, head 256->128->3). Needed because XLA's cost
    model cannot see inside the fused Pallas trunk's custom call."""
    d, mlp, n, h = 256, 1024, 17, 4
    per_token = 2 * d + 3 * d * d + d * d + 2 * d * mlp  # embed+qkv+proj+mlp
    per_token = per_token * 2  # 2 blocks... (embed counted twice: negligible)
    per_token += d * 128 + 128 * 3  # head
    attn = 2 * h * 2 * n * n * (d // h)  # scores + AV, both blocks
    return 2.0 * (n * per_token + attn)  # MAC -> FLOP


def tpu_lifting_throughput():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.lifters import (
        JointTransformerLifter,
        sinusoidal_positional_embeddings,
    )
    from pose3d_tpu.ops.pallas_lifter import lifter_forward_fused

    model = JointTransformerLifter(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, 17, 2)).astype(np.float32))
    params = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.key(0), x)["params"]  # jitted: eager init through the
    # tunnel remote-compiles every op individually (minutes)
    pe = sinusoidal_positional_embeddings(17, 256)

    def measure(apply_fn, label):
        c1 = jax.jit(_lift_chain(apply_fn, K1)).lower(params, x).compile()
        c2 = jax.jit(_lift_chain(apply_fn, K2)).lower(params, x).compile()

        def fenced(c):
            def run():
                _, s = c(params, x)
                return float(s)  # host materialization: the reliable fence
            return run

        per_iter, t1, t2 = _two_k(fenced(c1), fenced(c2), K1, K2)
        _log(f"lifting[{label}]: K{K1} {t1*1e3:.0f} ms, K{K2} {t2*1e3:.0f} ms"
             f" -> {per_iter*1e3:.3f} ms/iter (RTT cancelled)")
        return per_iter

    # headline: the fused Pallas trunk (the production serving path);
    # the plain XLA apply is reported alongside for the kernel's win factor
    fused_iter = measure(
        lambda p, kp: lifter_forward_fused(p, kp, pe=pe), "fused")
    xla_iter = measure(
        lambda p, kp: model.apply({"params": p}, kp, train=False), "xla")
    mfu = _mfu_fields(_lifter_flops_per_frame() * BATCH, fused_iter)
    return BATCH / fused_iter, BATCH / xla_iter, mfu


CPU_BATCH = 512
CPU_ITERS = 8


def cpu_reference_throughput() -> float:
    """Torch-CPU throughput of the same lifter architecture.

    Clean-room torch module with the reference MyViT's hyperparameters
    (baselineModel.py:312-362): 17 tokens dim 2 -> Linear 256 -> +PE ->
    2 pre-LN blocks (4 heads, double-LN quirk, 4x GELU MLP) -> 256->128->3.
    """
    import torch

    from pose3d_tpu.models.lifters import sinusoidal_positional_embeddings

    h, heads, blocks = 256, 4, 2

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = torch.nn.LayerNorm(h)
            self.ln_attn = torch.nn.LayerNorm(h)  # the reference's double LN
            self.qkv = torch.nn.Linear(h, 3 * h, bias=False)
            self.proj = torch.nn.Linear(h, h, bias=False)
            self.ln2 = torch.nn.LayerNorm(h)
            self.fc1 = torch.nn.Linear(h, 4 * h)
            self.fc2 = torch.nn.Linear(4 * h, h)

        def forward(self, x):
            y = self.ln_attn(self.ln1(x))
            q, k, v = self.qkv(y).chunk(3, dim=-1)
            b, n, _ = q.shape
            d = h // heads
            q, k, v = (t.reshape(b, n, heads, d).transpose(1, 2) for t in (q, k, v))
            a = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, dim=-1)
            y = (a @ v).transpose(1, 2).reshape(b, n, h)
            x = x + self.proj(y)
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.ln2(x))))

    class Lifter(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = torch.nn.Linear(2, h)
            pe = torch.from_numpy(sinusoidal_positional_embeddings(17, h))
            self.register_buffer("pe", pe)
            self.blocks = torch.nn.ModuleList([Block() for _ in range(blocks)])
            self.head1 = torch.nn.Linear(h, h // 2)
            self.head2 = torch.nn.Linear(h // 2, 3)

        def forward(self, x):
            x = self.embed(x) + self.pe
            for b in self.blocks:
                x = b(x)
            return self.head2(torch.relu(self.head1(x)))

    model = Lifter().eval()
    x = torch.rand(CPU_BATCH, 17, 2)
    best = float("inf")
    with torch.no_grad():
        model(x)  # warmup
        # best-of-3: the shared host's CPU throughput fluctuates ~2-3x
        # run-to-run; the fastest pass is the least-contended estimate
        # (conservative toward the baseline)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(CPU_ITERS):
                model(x)
            best = min(best, time.perf_counter() - t0)
    return CPU_BATCH * CPU_ITERS / best


# --------------------------------------------------------------------------
# 2. direct image->3D train step (config #4)
# --------------------------------------------------------------------------

DIRECT_B = 64
# K gap of 8 steps (~0.4 s) so the two-K delta clears the ~50 ms tunnel
# jitter; K=4/8 measured 44-60 ms/step run-to-run, K=4/12 tightens that
DIRECT_K1, DIRECT_K2 = 4, 12
REF_1080TI_FPS = 500.0  # BASELINE.md: 6.3 s/epoch, 49 batches x 64 frames


def tpu_direct_train_throughput():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.heads import PoseNet3D
    from pose3d_tpu.train.image_steps import make_direct_chunk_step
    from pose3d_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    model = PoseNet3D(return_heatmap=False, use_pallas=True,
                      dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((DIRECT_B, 256, 256, 3)),
        lr=1e-3,
    )
    step = make_direct_chunk_step(donate=True)

    compiled = {}

    def runner(k):
        frames = jnp.asarray(
            rng.integers(0, 256, (k, DIRECT_B, 256, 256, 3), dtype=np.uint8))
        kp = jnp.asarray(rng.random((k, DIRECT_B, 17, 3), np.float32) - 0.5)
        key = jax.random.key(1)
        compiled[k] = step.lower(state, frames, kp, key).compile()

        def run():
            # fresh buffers per call so donation can't invalidate state;
            # the copy is one constant cost per call -> cancels in two-K
            st = jax.tree_util.tree_map(lambda x: x.copy(), state)
            _, m = compiled[k](st, frames, kp, key)
            return float(m["loss"])

        return run

    per_step, t1, t2 = _two_k(runner(DIRECT_K1), runner(DIRECT_K2),
                              DIRECT_K1, DIRECT_K2)
    f1, f2 = _flops(compiled[DIRECT_K1]), _flops(compiled[DIRECT_K2])
    fl = _per_iter_flops(f1, f2)
    _log(f"direct: K{DIRECT_K1} {t1*1e3:.0f} ms, K{DIRECT_K2} "
         f"{t2*1e3:.0f} ms -> {per_step*1e3:.2f} ms/step")
    return DIRECT_B / per_step, _mfu_fields(fl, per_step)


# --------------------------------------------------------------------------
# 3. temporal-transformer train step (config #3)
# --------------------------------------------------------------------------

TEMPORAL_B = 8
TEMPORAL_K1, TEMPORAL_K2 = 4, 12


def tpu_temporal_train_throughput():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.train.epoch import make_lifter_epoch_fn
    from pose3d_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    model = TemporalLifter(dtype=jnp.bfloat16)
    t = model.clip_len
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((TEMPORAL_B, t, 17, 2)), lr=1e-3,
    )
    epoch_fn = make_lifter_epoch_fn(donate=False)

    compiled = {}

    def runner(k):
        y1 = jnp.asarray(rng.random((k, TEMPORAL_B, t, 17, 2), np.float32))
        y2 = jnp.asarray(
            rng.random((k, TEMPORAL_B, t, 17, 3), np.float32) - 0.5)
        key = jax.random.key(1)
        compiled[k] = epoch_fn.lower(state, y1, y2, key).compile()

        def run():
            _, m = compiled[k](state, y1, y2, key)
            return float(m["loss"])

        return run

    per_step, t1, t2 = _two_k(runner(TEMPORAL_K1), runner(TEMPORAL_K2),
                              TEMPORAL_K1, TEMPORAL_K2)
    f1, f2 = _flops(compiled[TEMPORAL_K1]), _flops(compiled[TEMPORAL_K2])
    fl = _per_iter_flops(f1, f2)
    _log(f"temporal: K{TEMPORAL_K1} {t1*1e3:.0f} ms, K{TEMPORAL_K2} "
         f"{t2*1e3:.0f} ms -> {per_step*1e3:.2f} ms/step")
    return TEMPORAL_B * t / per_step, _mfu_fields(fl, per_step)


# --------------------------------------------------------------------------
# 4. temporal-transformer inference (the video->3D serving path)
# --------------------------------------------------------------------------

TI_B = 16
TI_K1, TI_K2 = 8, 24


def tpu_temporal_infer_throughput():
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops.pallas_stblock import temporal_forward_fused

    rng = np.random.default_rng(0)
    xla_model = TemporalLifter(dtype=jnp.bfloat16)
    t = xla_model.clip_len
    x = jnp.asarray(rng.random((TI_B, t, 17, 2)).astype(np.float32))
    params = jax.jit(
        lambda r, xx: xla_model.init({"params": r}, xx)
    )(jax.random.key(0), x)["params"]

    def measure(apply_fn, label):
        def chain(k):
            def f(p, xx):
                def body(kp, _):
                    out = apply_fn(p, kp)
                    return kp + out[..., :2] * 1e-3, out[0, 0, 0, 0]

                kp, s = jax.lax.scan(body, xx, None, length=k)
                return kp, s[-1]

            return jax.jit(f)

        c1 = chain(TI_K1).lower(params, x).compile()
        c2 = chain(TI_K2).lower(params, x).compile()

        def fenced(c):
            def run():
                _, s = c(params, x)
                return float(s)
            return run

        per_iter, t1, t2 = _two_k(fenced(c1), fenced(c2), TI_K1, TI_K2)
        _log(f"temporal_infer[{label}]: {per_iter*1e3:.2f} ms/iter")
        return per_iter

    # headline: the fully-fused serving forward (spatial sub-block
    # megakernel + per-sequence temporal attention, the pipeline/lift path)
    pallas_iter = measure(lambda p, kp: temporal_forward_fused(p, kp),
                          "fused")
    xla_iter = measure(
        lambda p, kp: xla_model.apply({"params": p}, kp), "xla")
    return TI_B * t / pallas_iter, TI_B * t / xla_iter


def main():
    tpu_fps, xla_fps, lift_mfu = tpu_lifting_throughput()
    _log(f"lifting: {tpu_fps:,.0f} frames/s/chip (fused Pallas trunk; "
         f"xla apply {xla_fps:,.0f}) {lift_mfu}")
    cpu_fps = cpu_reference_throughput()
    _log(f"lifting cpu reference: {cpu_fps:,.0f} frames/s")

    extra = {
        "lifting_infer": {
            "frames_per_s": round(tpu_fps, 1),
            "vs_torch_cpu": round(tpu_fps / cpu_fps, 2),
            "xla_apply_frames_per_s": round(xla_fps, 1),
            "config": "fused Pallas whole-trunk kernel, B=8192 bf16",
            **lift_mfu,
        },
    }
    try:
        direct_fps, direct_mfu = tpu_direct_train_throughput()
        _log(f"direct train: {direct_fps:,.0f} frames/s {direct_mfu}")
        extra["direct_train"] = {
            "frames_per_s": round(direct_fps, 1),
            "vs_1080ti": round(direct_fps / REF_1080TI_FPS, 2),
            "config": "R50+64^3 soft-argmax B=64 bf16 (XLA NHWC decode)",
            **direct_mfu,
        }
    except Exception as e:  # noqa: BLE001 — headline must still print
        _log(f"direct train bench FAILED: {type(e).__name__}: {e}")
        extra["direct_train"] = {"error": str(e)[:200]}
    try:
        temporal_fps, temporal_mfu = tpu_temporal_train_throughput()
        _log(f"temporal train: {temporal_fps:,.0f} frames/s {temporal_mfu}")
        extra["temporal_train"] = {
            "frames_per_s": round(temporal_fps, 1),
            "vs_baseline": None,  # reference delegates to external MotionBERT
            "config": "243-frame 5-block transformer B=8 bf16",
            **temporal_mfu,
        }
    except Exception as e:  # noqa: BLE001
        _log(f"temporal train bench FAILED: {type(e).__name__}: {e}")
        extra["temporal_train"] = {"error": str(e)[:200]}
    try:
        ti_fps, ti_xla_fps = tpu_temporal_infer_throughput()
        _log(f"temporal infer: {ti_fps:,.0f} frames/s "
             f"(xla {ti_xla_fps:,.0f})")
        extra["temporal_infer"] = {
            "frames_per_s": round(ti_fps, 1),
            "xla_apply_frames_per_s": round(ti_xla_fps, 1),
            "vs_baseline": None,  # reference: external MotionBERT, no number
            "config": "243-frame serving, fused spatial+temporal sub-block kernels, B=16 bf16",
        }
    except Exception as e:  # noqa: BLE001
        _log(f"temporal infer bench FAILED: {type(e).__name__}: {e}")
        extra["temporal_infer"] = {"error": str(e)[:200]}

    print(json.dumps({
        "metric": "lifted frames/sec/chip (H3.6M 2D->3D)",
        "value": round(tpu_fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
