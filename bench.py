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
  5. flip_lift       — flip-consistency 2x-batch lifting step (config #2,
                       train_5.py:153-168 contract; the reference re-runs
                       the models sequentially on the flipped batch)
  6. e2e_video       — whole video->3D pipeline wall-clock (config #5,
                       run.py:453-478): native decode -> PoseNet2D ->
                       fused temporal lift -> reprojection; video frames/s

stdout: exactly ONE JSON line — the headline lifting metric, with the other
workloads nested under "extra". Human-readable logs go to stderr.

Methodology (important on this tunneled-TPU environment):
- ``block_until_ready`` does NOT fence execution through the axon tunnel and
  per-call dispatch costs tens of ms, so per-call timing loops measure
  nothing. Every workload is iterated ON DEVICE inside a ``lax.fori_loop``
  (each iteration depends on the previous, so no step can be elided),
  fenced by materializing a scalar to host.
- Two trip counts K1 < K2 are timed; per-iteration time is
  (t2 - t1) / (K2 - K1): tunnel round-trip and constant overhead cancel.
  Since round 5 the chain takes the trip count as a RUNTIME scalar
  (``lax.fori_loop`` with a traced bound), so ONE compiled executable
  serves both K values — half the compile cost of the old per-K ``scan``
  chains, and the K1/K2 delta is guaranteed to compare identical code.
- Estimator (round 5): MEDIAN over repeats, computed as
  (median(t2 trials) - median(t1 trials)) / (K2 - K1). The donor chip is
  co-tenanted with one-sided contention spikes; best-of-N measured the
  noise floor (and per-trial differences even went negative when a spike
  hit one K1 trial — BENCH_r04's -1124 ms sample). Medians of each chain
  separately are robust unless >half the trials of a chain are spiked;
  the per-trial deltas are still reported as the dispersion record.
- FLOPs come from XLA's own cost model (compiled.cost_analysis()); the cost
  model counts a loop body once regardless of trip count, so the body count
  IS the per-iteration figure. MFU is reported against the v5e bf16 MXU
  peak.

Driver-proofing (round 5, VERDICT r4 item 1): workloads run in scoreboard
order (lifting -> direct -> temporal train -> temporal infer -> flip ->
e2e), a CUMULATIVE headline JSON line is printed after EVERY workload (a
timeout kill leaves the latest complete line in the tail — the last JSON
line on stdout is always the freshest full record), and the whole run sits
under an internal time budget (BENCH_BUDGET_S, default 1080 s): workloads
that would overrun are skipped with a marker instead of eating the
driver's timeout.

Lean mode: comparison configs are sacrificed BEFORE workload coverage.
When the remaining budget no longer covers a workload's full cost PLUS
every downstream floor, the workload drops its non-headline comparison
config (direct: the second epilogue; temporal train/infer: the XLA-apply
timing) and records the skip. Six measured workloads with one config each
beat four with two. The lifting workload's own XLA-apply comparison — the
single costliest cold compile in the bench — is DEFERRED to after the
last workload and only runs on leftover budget.

Cost structure (2026-08-20 validation, single-chip): cold compile cache
-> 979 s for all six workloads + every comparison except lifting-XLA
(lifting-fused ~300, direct-both 169, temporal-train-both 247,
temporal-infer-both 99, flip 20, e2e 144); warm cache -> ~380 s for
everything. The persistent executable cache (logs/jax_cache, anchored to
this file's directory, BENCH_COMPILE_CACHE=0 opts out) only skips
compilation — the timed executables are identical — so repeated driver
runs converge to the warm cost.
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


def _mfu_fields(flops_per_iter, per_iter_s):
    if not flops_per_iter or per_iter_s <= 0:
        return {}
    tf = flops_per_iter / per_iter_s / 1e12
    return {"tflops": round(tf, 1),
            "mfu_vs_bf16_peak": round(tf * 1e12 / V5E_BF16_PEAK, 4)}


def _two_k(run1, run2, k1, k2, repeats=3):
    """Compile+warm both, then time; returns (s/iter, t1_med, t2_med)."""
    per, t1, t2, _, _ = _two_k_median(run1, run2, k1, k2, repeats=repeats)
    return per, t1, t2


def _two_k_median(run1, run2, k1, k2, repeats=5):
    """Repeated two-K measurement: MEDIAN per-iteration time + dispersion.

    The tunneled donor chip is co-tenanted — the SAME executable has
    measured 27..60 ms/step across runs (ROUND2_NOTES), and contention
    spikes are one-sided. Round 4's best-of-N measured the noise floor
    (the 2,342 f/s direct headline was one lucky draw; the driver record
    said 1,316). The round-5 estimator is
        (median over t2 trials - median over t1 trials) / (k2 - k1)
    — robust unless more than half of either chain's trials are spiked,
    and structurally unable to go negative the way per-trial differences
    could (BENCH_r04's -1124.66 ms sample). Returns
    (per_iter_s, t1_med, t2_med, per-trial-delta list, dispersion dict).
    """
    run1()
    run2()
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run1()
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run2()
        t2s.append(time.perf_counter() - t0)
    return _median_estimate(t1s, t2s, k1, k2)


def _median_estimate(t1s, t2s, k1, k2):
    """Pure estimator math (unit-tested): median(t2) - median(t1) over the
    K gap, falling back to the raw K2 upper bound when >half the K1 trials
    are contention-spiked (the configuration where BENCH_r04's per-trial
    differences went to -1124 ms)."""
    deltas = [(b - a) / (k2 - k1) for a, b in zip(t1s, t2s)]
    t1m, t2m = float(np.median(t1s)), float(np.median(t2s))
    per = (t2m - t1m) / (k2 - k1)
    if per <= 0:  # >half the K1 trials spiked; raw K2 upper bound
        per = t2m / k2
    q1, q3 = np.percentile(deltas, [25, 75])
    disp = {"estimator": f"median_of_{len(t1s)}_two_k",
            "delta_iqr_ms": [round(q1 * 1e3, 2), round(q3 * 1e3, 2)]}
    return per, t1m, t2m, deltas, disp


def _lean_decision(remaining_s, full_cost, downstream_floors, override=None):
    """Drop a workload's comparison config when the remaining budget no
    longer covers its full two-config cost plus every downstream
    workload's lean floor. override: BENCH_LEAN env ("1" forces lean,
    "0" forces full comparisons)."""
    if override is not None:
        return override == "1"
    return remaining_s < full_cost + downstream_floors


# --------------------------------------------------------------------------
# 1. lifting inference (headline)
# --------------------------------------------------------------------------

def _lift_chain(apply_fn):
    """Inference chain with a RUNTIME trip count: chain(params, kp, k)
    fori_loops k data-dependent forwards (next input derives from the
    previous output, so no iteration can be elided) and returns a scalar
    sample for the host-materialization fence. One compile serves every k."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chain(params, kp, k):
        def body(_, carry):
            kp, _s = carry
            out = apply_fn(params, kp)
            return (kp + out[..., :2] * 1e-3,
                    out.reshape(-1)[0].astype(jnp.float32))

        kp, sample = lax.fori_loop(
            0, k, body, (kp, jnp.float32(0.0)))
        return kp, sample

    return chain


def _compile_chain(chain, *args, label=None):
    """Lower+compile a dynamic-K chain once and return a fenced runner
    factory: runner(k)() executes the SAME executable with trip count k and
    blocks on a host-materialized scalar (block_until_ready does not fence
    through the axon tunnel). XLA's cost model counts the loop body ONCE
    regardless of trip count (verified: flops(K=3) == flops(K=10) to within
    epilogue noise), so ``_flops(compiled)`` is the per-iteration figure."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    compiled = jax.jit(chain).lower(*args, jnp.int32(1)).compile()
    if label:
        _log(f"compile[{label}]: {time.perf_counter() - t0:.1f}s")

    def runner(k):
        karr = jnp.int32(k)

        def run():
            out = compiled(*args, karr)
            s = out[-1] if isinstance(out, tuple) else out
            return float(s)

        return run

    return compiled, runner


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
    """Measure the headline fused-trunk lifting throughput. Returns
    (fused_fps, mfu_fields, measure_xla) — ``measure_xla()`` times the
    plain-XLA-apply comparison chain and is DEFERRED by main() to the very
    end of the run: its ~4-minute cold compile is the single biggest cold
    cost in the bench, and it informs only the kernel's win factor, never
    the scoreboard value (VERDICT r4 item 1: coverage before comparisons)."""
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
        _, runner = _compile_chain(_lift_chain(apply_fn), params, x,
                                   label=f"lifting:{label}")
        per_iter, t1, t2 = _two_k(runner(K1), runner(K2), K1, K2,
                                  repeats=5 if label == "fused" else 3)
        _log(f"lifting[{label}]: K{K1} {t1*1e3:.0f} ms, K{K2} {t2*1e3:.0f} ms"
             f" -> {per_iter*1e3:.3f} ms/iter (RTT cancelled)")
        return per_iter

    # headline: the fused Pallas trunk (the production serving path)
    fused_iter = measure(
        lambda p, kp: lifter_forward_fused(p, kp, pe=pe), "fused")
    mfu = _mfu_fields(_lifter_flops_per_frame() * BATCH, fused_iter)

    def measure_xla():
        return BATCH / measure(
            lambda p, kp: model.apply({"params": p}, kp, train=False), "xla")

    return BATCH / fused_iter, mfu, measure_xla


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

    cache_key = f"torch{torch.__version__}-b{CPU_BATCH}i{CPU_ITERS}"
    cached = _cpu_ref_cache_read(cache_key)
    if cached is not None:
        return cached  # main() logs the value (with no duplicate line)

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
    fps = CPU_BATCH * CPU_ITERS / best
    _cpu_ref_cache_write(cache_key, fps)
    return fps


import os as _os

_CPU_REF_CACHE = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "logs",
    "cpu_ref_cache.json")  # file-anchored, not cwd-relative (see cache note)


def _cpu_ref_cache_read(key):
    """The torch-CPU anchor is code-stable (clean-room module, fixed
    shapes); re-measuring it every driver run spends bench budget on a
    number that only moves with host contention. Cache best-of-3 keyed by
    torch version + config; delete the file to force a re-measure."""
    try:
        with open(_CPU_REF_CACHE) as f:
            data = json.load(f)
        return float(data[key])
    except Exception:
        return None


def _cpu_ref_cache_write(key, fps):
    try:
        import os

        os.makedirs(os.path.dirname(_CPU_REF_CACHE), exist_ok=True)
        data = {}
        try:
            with open(_CPU_REF_CACHE) as f:
                data = json.load(f)
        except Exception:
            pass
        # keep the best (least-contended) measurement across runs
        data[key] = max(fps, float(data.get(key, 0.0)))
        with open(_CPU_REF_CACHE, "w") as f:
            json.dump(data, f)
    except Exception:
        pass


# --------------------------------------------------------------------------
# 2. direct image->3D train step (config #4)
# --------------------------------------------------------------------------

DIRECT_B = 64
# K gap of 8 steps (~0.4 s) so the two-K delta clears the ~50 ms tunnel
# jitter; K=4/8 measured 44-60 ms/step run-to-run, K=4/12 tightens that
DIRECT_K1, DIRECT_K2 = 4, 12
REF_1080TI_FPS = 500.0  # BASELINE.md: 6.3 s/epoch, 49 batches x 64 frames


def tpu_direct_train_throughput(both_epilogues=True):
    """both_epilogues=False is lean mode: time only the fused conv+decode
    epilogue (the round-4 flagship kernel; the winner of the freshest
    driver-methodology record, campaign_r5/bench_final 38.47 vs 61.39 ms)
    with the XLA epilogue as the exception fallback. The two epilogues
    measured within co-tenancy noise of each other across windows
    (ROUND5_NOTES), so the skipped comparison costs no information the
    repo doesn't already have on record."""
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.heads import PoseNet3D
    from pose3d_tpu.train.image_steps import make_direct_train_step
    from pose3d_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    # single-batch step (donate=False: the chain's carry owns the evolving
    # state; the caller-held buffers stay valid across repeated calls)
    single_step = make_direct_train_step(donate=False)

    def measure(fuse):
        model = PoseNet3D(return_heatmap=False, use_pallas=True,
                          fuse_final_conv=fuse, dtype=jnp.bfloat16)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((DIRECT_B, 256, 256, 3)),
            lr=1e-3,
        )
        frames = jnp.asarray(rng.integers(
            0, 256, (DIRECT_K2, DIRECT_B, 256, 256, 3), dtype=np.uint8))
        kp = jnp.asarray(
            rng.random((DIRECT_K2, DIRECT_B, 17, 3), np.float32) - 0.5)

        def chain(st, frames, kp, key, k):
            rngs = jax.random.split(key, DIRECT_K2)

            def body(i, carry):
                st, _ = carry
                st, m = single_step(st, frames[i], kp[i], rngs[i])
                return st, m["loss"].astype(jnp.float32)

            _, loss = jax.lax.fori_loop(
                0, k, body, (st, jnp.float32(0.0)))
            return loss

        compiled, runner = _compile_chain(
            chain, state, frames, kp, jax.random.key(1),
            label=f"direct:{'fused' if fuse else 'xla'}")

        # median-of-9 against chip co-tenancy (VERDICT r4 item 1): the
        # driver number is the reproducible middle of the distribution,
        # with the per-trial deltas on the record as the dispersion
        per_step, t1, t2, samples, disp_stats = _two_k_median(
            runner(DIRECT_K1), runner(DIRECT_K2), DIRECT_K1, DIRECT_K2,
            repeats=9,
        )
        fl = _flops(compiled)
        disp = [round(s * 1e3, 2) for s in samples]
        _log(f"direct ({'fused' if fuse else 'xla'} epilogue): median "
             f"{per_step*1e3:.2f} ms/step (9 two-K repeats, deltas ms: "
             f"{disp}, iqr {disp_stats['delta_iqr_ms']})")
        return per_step, fl, disp, disp_stats

    if not both_epilogues:
        # lean mode: one config only — fused first, XLA on Mosaic failure
        try:
            per_step, fl, disp, disp_stats = measure(True)
            extra = {"fused_epilogue_ms": round(per_step * 1e3, 2),
                     "fused_step_ms_samples": disp, "epilogue": "fused",
                     "xla_epilogue_ms": "skipped (budget lean mode)",
                     **disp_stats}
        except Exception as e:  # noqa: BLE001 — fall back, don't kill bench
            _log(f"direct fused-epilogue attempt failed: {type(e).__name__}"
                 f": {str(e)[:200]}")
            per_step, fl, disp, disp_stats = measure(False)
            extra = {"xla_epilogue_ms": round(per_step * 1e3, 2),
                     "step_ms_samples": disp, "epilogue": "xla",
                     "fused_epilogue_ms": None, **disp_stats}
        mfu = _mfu_fields(fl, per_step)
        mfu.update(extra)
        return DIRECT_B / per_step, mfu

    per_step, fl, disp, disp_stats = measure(False)
    extra = {"xla_epilogue_ms": round(per_step * 1e3, 2),
             "step_ms_samples": disp, "epilogue": "xla", **disp_stats}
    # round-4 fused 1x1-conv+decode kernel (ops/pallas_conv_decode): take
    # it when it wins AT THE MEDIAN; a Mosaic reject or regression falls
    # back, with both configurations on the record either way
    try:
        fused_step, fused_fl, fused_disp, _ = measure(True)
        extra["fused_epilogue_ms"] = round(fused_step * 1e3, 2)
        extra["fused_step_ms_samples"] = fused_disp
        if fused_step < per_step:
            per_step, fl = fused_step, fused_fl or fl
            extra["epilogue"] = "fused"
    except Exception as e:  # noqa: BLE001 — fallback must not kill bench
        _log(f"direct fused-epilogue attempt failed: {type(e).__name__}: "
             f"{str(e)[:200]}")
        extra["fused_epilogue_ms"] = None
    mfu = _mfu_fields(fl, per_step)
    mfu.update(extra)
    return DIRECT_B / per_step, mfu


# --------------------------------------------------------------------------
# 3. temporal-transformer train step (config #3)
# --------------------------------------------------------------------------

TEMPORAL_B = 8
TEMPORAL_K1, TEMPORAL_K2 = 4, 12


def tpu_temporal_train_throughput(compare_xla=True):
    """compare_xla=False is lean mode: time only the fused-kernel path
    (the benchmarked workload). The XLA apply is still COMPILED once at K1
    — its cost-model body count is the only honest FLOP figure for the
    fused path's MFU (the cost model can't see into custom calls) — but
    its two-K timing (a second compile + 7 repeats) is skipped."""
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.ops.pallas_stblock_train import make_fused_train_apply
    from pose3d_tpu.train.state import create_train_state
    from pose3d_tpu.train.steps import make_lifter_train_step

    rng = np.random.default_rng(0)
    model = TemporalLifter(dtype=jnp.bfloat16)
    t = model.clip_len
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((TEMPORAL_B, t, 17, 2)), lr=1e-3,
    )
    single_step = make_lifter_train_step(donate=False)
    y1 = jnp.asarray(
        rng.random((TEMPORAL_K2, TEMPORAL_B, t, 17, 2), np.float32))
    y2 = jnp.asarray(
        rng.random((TEMPORAL_K2, TEMPORAL_B, t, 17, 3), np.float32) - 0.5)

    def measure(st, label):
        def chain(st, y1, y2, key, k):
            rngs = jax.random.split(key, TEMPORAL_K2)

            def body(i, carry):
                st, _ = carry
                st, m = single_step(st, y1[i], y2[i], rngs[i])
                return st, m["loss"].astype(jnp.float32)

            _, loss = jax.lax.fori_loop(
                0, k, body, (st, jnp.float32(0.0)))
            return loss

        compiled, runner = _compile_chain(
            chain, st, y1, y2, jax.random.key(1), label=f"temporal:{label}")

        # median-of-7: the same chip-co-tenancy defense as direct_train —
        # measured spread on this step is 30.6..37.1 ms across windows
        per_step, t1, t2, samples, disp_stats = _two_k_median(
            runner(TEMPORAL_K1), runner(TEMPORAL_K2),
            TEMPORAL_K1, TEMPORAL_K2, repeats=7)
        _log(f"temporal[{label}]: median {per_step*1e3:.2f} ms/step "
             f"(7 two-K repeats, deltas ms: "
             f"{[round(s*1e3, 2) for s in samples]}, "
             f"iqr {disp_stats['delta_iqr_ms']})")
        return per_step, _flops(compiled)

    # headline: fused Pallas fwd+bwd sub-block kernels (remat-in-kernel,
    # dW accumulated across grid cells) — the round-3 training kernel;
    # plain XLA apply measured alongside for the win factor
    fused_state = state.replace(apply_fn=make_fused_train_apply())
    fused_step, fused_fl = measure(fused_state, "fused")
    per_step = fused_step
    if compare_xla:
        xla_step, xla_fl = measure(state, "xla")
        # the fused path IS the benchmarked workload — report it as the
        # headline even if it regresses below XLA (min() would silently
        # mask a kernel regression as ~1.0x); xla_frames_per_s is in extra
        if xla_step < fused_step:
            _log(f"WARNING: fused temporal train step "
                 f"({fused_step*1e3:.1f} ms) slower than XLA "
                 f"({xla_step*1e3:.1f} ms) — kernel regression")
        fl = xla_fl
        xla_fps = round(TEMPORAL_B * t / xla_step, 1)
    else:
        # one compile of the plain-apply SINGLE step, flops only (no
        # timing) — the only honest FLOP figure for the fused path's MFU
        fl = _flops(single_step.lower(
            state, y1[0], y2[0], jax.random.key(1)).compile())
        xla_fps = "skipped (budget lean mode)"
    # the cost model can't see into the custom calls of the fused path —
    # use the XLA body count (identical math) for its MFU
    mfu = _mfu_fields(fl, per_step)
    mfu["xla_frames_per_s"] = xla_fps
    mfu["fused_frames_per_s"] = round(TEMPORAL_B * t / fused_step, 1)
    return TEMPORAL_B * t / per_step, mfu


# --------------------------------------------------------------------------
# 4. temporal-transformer inference (the video->3D serving path)
# --------------------------------------------------------------------------

TI_B = 16
TI_K1, TI_K2 = 8, 24


def tpu_temporal_infer_throughput(compare_xla=True):
    """compare_xla=False is lean mode: skip the plain-XLA apply timing
    (two compiles + a two-K chain) and report only the fused serving
    forward — the path the pipeline actually runs."""
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
        _, runner = _compile_chain(_lift_chain(apply_fn), params, x,
                                   label=f"temporal_infer:{label}")
        per_iter, t1, t2 = _two_k(runner(TI_K1), runner(TI_K2),
                                  TI_K1, TI_K2)
        _log(f"temporal_infer[{label}]: {per_iter*1e3:.2f} ms/iter")
        return per_iter

    # headline: the fully-fused serving forward (spatial sub-block
    # megakernel + per-sequence temporal attention, the pipeline/lift path)
    pallas_iter = measure(lambda p, kp: temporal_forward_fused(p, kp),
                          "fused")
    if not compare_xla:
        return TI_B * t / pallas_iter, None
    xla_iter = measure(
        lambda p, kp: xla_model.apply({"params": p}, kp), "xla")
    return TI_B * t / pallas_iter, TI_B * t / xla_iter


# --------------------------------------------------------------------------
# 5. flip-consistency batched lifting (BASELINE config #2)
# --------------------------------------------------------------------------

FLIP_B = 4096  # doubled to 8192 rows inside the step (32-row tile multiple)


def tpu_flip_lift_throughput():
    """One flip-consistency lifting step: the reference re-runs every model
    on the flipped batch sequentially (train_5.py:153-168); here
    {identity, flip} is ONE 2x batch through the fused trunk and the
    predictions are flip-averaged on device."""
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.core.transforms import flip_pose
    from pose3d_tpu.models.lifters import (
        JointTransformerLifter,
        sinusoidal_positional_embeddings,
    )
    from pose3d_tpu.ops.pallas_lifter import lifter_forward_fused

    model = JointTransformerLifter(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((FLIP_B, 17, 2)).astype(np.float32))
    params = jax.jit(
        lambda r, xx: model.init({"params": r}, xx, train=False)
    )(jax.random.key(0), x)["params"]
    pe = sinusoidal_positional_embeddings(17, 256)

    def flip_apply(p, kp):
        kp2 = jnp.concatenate([kp, flip_pose(kp)], 0)
        out = lifter_forward_fused(p, kp2, pe=pe)
        return (out[:FLIP_B] + flip_pose(out[FLIP_B:])) / 2.0

    _, runner = _compile_chain(_lift_chain(flip_apply), params, x,
                               label="flip")
    per_iter, t1, t2 = _two_k(runner(K1), runner(K2), K1, K2)
    _log(f"flip_lift: {per_iter*1e3:.3f} ms/iter "
         f"({FLIP_B} frames x2 forwards)")
    # 2x the model FLOPs per output frame (both flip branches are real work)
    mfu = _mfu_fields(2 * _lifter_flops_per_frame() * FLIP_B, per_iter)
    return FLIP_B / per_iter, mfu


# --------------------------------------------------------------------------
# 6. end-to-end video -> 3D (BASELINE config #5: the phase-2 pipeline)
# --------------------------------------------------------------------------

E2E_FRAMES = 512
E2E_DETECT_B = 64


def _make_bench_video(path, n=E2E_FRAMES, w=640, h=480):
    import cv2

    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30.0, (w, h))
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    for i in range(n):
        frame = np.stack([
            (xx * 2 + i * 3) % 256, (yy * 3 + i) % 256, (xx + yy + i * 5) % 256,
        ], axis=-1).astype(np.uint8)
        writer.write(frame)
    writer.release()


DET_TRAIN_FLOOR_S = 130.0  # 600-step distillation measured 71 s + compiles


def _build_e2e_detector(batch, train_budget_s=0.0):
    """PoseNet2D for the e2e pipeline: the TRAINED checkpoint when one
    exists (VERDICT r4 item 4 — the recorded e2e number should reflect the
    real path, not a randomly-initialized detector), random init otherwise.
    Checkpoint location: $POSE3D_DET_LOGDIR / $POSE3D_DET_RUN (defaults
    ./logs, det-bench — `python -m pose3d_tpu.cli.train_detector
    --run_name det-bench` writes it). When the checkpoint is MISSING (the
    untracked logs/ dir is wiped between sessions on this host) and
    ``train_budget_s`` covers the measured ~71 s distillation, bench trains
    it in place (deterministic seeds reproduce the committed 2.88 px @256
    record) rather than silently benching random init; POSE3D_DET_TRAIN=0
    opts out. Returns (detect_fn, source_label)."""
    import contextlib
    import os

    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.heads import PoseNet2D
    from pose3d_tpu.train import checkpoint as ckpt

    log_dir = os.environ.get("POSE3D_DET_LOGDIR", "./logs")
    run = os.environ.get("POSE3D_DET_RUN", "det-bench")
    if (not ckpt.exists(log_dir, run)
            and train_budget_s >= DET_TRAIN_FLOOR_S
            and os.environ.get("POSE3D_DET_TRAIN", "1") != "0"):
        _log(f"e2e: no detector checkpoint at {log_dir}/{run} — training "
             f"one ({train_budget_s:.0f}s spare budget)")
        try:
            from pose3d_tpu.cli.train_detector import train as _train_det
            from pose3d_tpu.config import DetectorConfig

            # stdout must stay JSON-only for the driver; the trainer prints
            with contextlib.redirect_stdout(sys.stderr):
                _train_det(DetectorConfig(run_name=run, log_dir=log_dir))
        except Exception as e:  # noqa: BLE001 — fall back to random init
            _log(f"e2e: detector training failed "
                 f"({type(e).__name__}: {str(e)[:160]})")
    arch, source = "resnet50", "random-init"
    if ckpt.exists(log_dir, run):
        meta = ckpt.load_meta(log_dir, run)
        arch = meta.get("architecture", "resnet50")
        source = f"trained({run}, eval_px={meta.get('eval_px_err', '?')})"

    det = PoseNet2D(architecture=arch, dtype=jnp.bfloat16)
    det_vars = jax.jit(
        lambda r, xx: det.init({"params": r}, xx, train=False)
    )(jax.random.key(0), jnp.zeros((batch, 256, 256, 3)))
    if source != "random-init":
        try:
            params, stats = ckpt.restore_params(
                log_dir, run, det_vars["params"],
                batch_stats_template=det_vars["batch_stats"])
            det_vars = {"params": params, "batch_stats": stats}
        except Exception as e:  # noqa: BLE001 — fall back, keep benching
            _log(f"e2e: trained detector restore failed "
                 f"({type(e).__name__}: {str(e)[:120]}); using random init")
            source = "random-init"

    @jax.jit
    def detect(frames_u8):
        x = frames_u8.astype(jnp.float32) / 256.0  # H36_dataset.py:131
        return det.apply(det_vars, x, train=False).reshape(-1, 17, 2)

    return detect, source


def tpu_e2e_video_throughput(spare_budget_s=0.0):
    """Whole video->3D pipeline wall-clock: native C++ decode (OVERLAPPED
    with detection — chunk i detects on device while chunk i+1 decodes) ->
    PoseNet2D detector (trained checkpoint when available) -> fused
    temporal lifter -> reprojection-consistency reduction. This is the
    reference's phase-2 story (run.py:453-478: ffmpeg + ONE OpenPifPaf
    SUBPROCESS PER FRAME + external MotionBERT — minutes/video) as one
    native in-process pipeline.

    Two numbers (VERDICT r4 item 6): ``video_frames_per_s`` is the
    end-to-end wall including decode and tunnel transfers
    (environment-dominated here — the axon tunnel makes host->device copies
    of 100 MB of frames cost seconds they would not on a real host), and
    ``device_resident_fps`` is the chip-side detect+lift rate on frames
    already in HBM — the number that measures the chip and is stable
    across tunnel conditions."""
    import pathlib
    import tempfile

    import jax
    import jax.numpy as jnp

    from pose3d_tpu import losses
    from pose3d_tpu.data.native_video import (
        native_available,
        stream_video_frames,
    )
    from pose3d_tpu.models.temporal import TemporalLifter
    from pose3d_tpu.pipeline.lift import lift_sequence

    video = pathlib.Path(tempfile.gettempdir()) / "pose3d_bench_e2e.mp4"
    if not video.exists():
        _make_bench_video(video)

    detect, det_source = _build_e2e_detector(E2E_DETECT_B, spare_budget_s)
    _log(f"e2e detector: {det_source}")

    lifter = TemporalLifter(dtype=jnp.bfloat16)
    lifter_params = jax.jit(
        lambda r, xx: lifter.init({"params": r}, xx)
    )(jax.random.key(1), jnp.zeros((1, lifter.clip_len, 17, 2)))["params"]

    @jax.jit
    def reproject_gap(pose3d, kp2d):
        # phase-5 reprojection-consistency term (losses.py proj gap):
        # orthographic root-centred (x,y) vs the detected 2D
        p = pose3d[..., :2] - pose3d[..., :1, :2]
        k = kp2d - kp2d[..., :1, :]
        return losses.l1(p, k)

    def pad_chunk(chunk):
        pad = E2E_DETECT_B - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad, 256, 256, 3), np.uint8)])
        return chunk, E2E_DETECT_B - pad

    def run_pipeline():
        ts = {}
        # decode+detect OVERLAPPED: jax dispatch is async, so detection of
        # chunk i runs on device while the C++ decoder produces chunk i+1
        t0 = time.perf_counter()
        pending, tails = [], []
        for chunk in stream_video_frames(video, size=256,
                                         chunk=E2E_DETECT_B):
            chunk, n_real = pad_chunk(chunk)
            pending.append(detect(jnp.asarray(chunk)))
            tails.append(n_real)
        kp2d = np.concatenate(
            [np.asarray(p)[:n] for p, n in zip(pending, tails)]
        )  # (N,17,2) in [0,1]
        ts["decode+detect"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pose3d = lift_sequence(lifter_params, lifter, kp2d * 1000.0,
                               image_size=1000.0)
        ts["lift"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        gap = float(reproject_gap(jnp.asarray(pose3d), jnp.asarray(kp2d)))
        ts["reproject"] = time.perf_counter() - t0
        assert np.isfinite(gap)
        return ts, len(kp2d), kp2d

    run_pipeline()  # warm: compiles detector + fused lifter shapes
    best, stages, n, kp2d = None, None, 0, None
    for _ in range(2):
        ts, n, kp2d = run_pipeline()
        total = sum(ts.values())
        if best is None or total < best:
            best, stages = total, ts
    fps = n / best

    # chip-side rate: frames staged to HBM untimed, then detect (all chunks
    # enqueued async, one fence) + lift timed — no decode, no host->device
    dev_chunks, tails = [], []
    off = 0
    while off < n:
        chunk, n_real = pad_chunk(
            np.zeros((min(E2E_DETECT_B, n - off), 256, 256, 3), np.uint8))
        dev_chunks.append(jax.device_put(jnp.asarray(chunk)))
        tails.append(n_real)
        off += n_real
    jax.block_until_ready(dev_chunks)
    t0 = time.perf_counter()
    pend = [detect(c) for c in dev_chunks]
    kp_dev = np.concatenate(
        [np.asarray(p)[:m] for p, m in zip(pend, tails)])
    t_detect_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    lift_sequence(lifter_params, lifter, kp_dev * 1000.0, image_size=1000.0)
    t_lift_dev = time.perf_counter() - t0
    chip_fps = n / (t_detect_dev + t_lift_dev)

    _log(f"e2e video->3D: {fps:,.0f} video frames/s "
         f"({n} frames in {best*1e3:.0f} ms; "
         + ", ".join(f"{k} {v*1e3:.0f}" for k, v in stages.items())
         + f" ms; native decode={native_available()}; "
         f"chip-side {chip_fps:,.0f} fps "
         f"(detect {t_detect_dev*1e3:.0f} + lift {t_lift_dev*1e3:.0f} ms, "
         f"device-resident); detector={det_source})")
    stage_ms = {k: round(v * 1e3, 1) for k, v in stages.items()}
    return fps, {"stage_ms": stage_ms,
                 "device_resident_fps": round(chip_fps, 1),
                 "device_detect_ms": round(t_detect_dev * 1e3, 1),
                 "device_lift_ms": round(t_lift_dev * 1e3, 1),
                 "detector": det_source}


def _fail_headline(reason: str):
    """The contract is ONE JSON line no matter what — an honest failure
    record beats a silent crash (e.g. the axon tunnel going Unavailable,
    observed 2026-08-18: backend init hangs indefinitely)."""
    print(json.dumps({
        "metric": "lifted frames/sec/chip (H3.6M 2D->3D)",
        "value": 0.0,
        "unit": "frames/s/chip",
        "vs_baseline": 0.0,
        "extra": {"error": reason[:300]},
    }), flush=True)


def _init_backend_or_die(timeout_s: int = 600):
    """Initialize the TPU backend under a watchdog: jax backend-init over
    the tunnel can hang (not raise) when the donor chip is unreachable; a
    daemon thread + hard exit keeps the one-JSON-line contract."""
    import os
    import threading

    result = {}

    def probe():
        try:
            import jax

            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001
            result["error"] = f"{type(e).__name__}: {e}"

    if os.environ.get("BENCH_COMPILE_CACHE", "1") != "0":
        # persistent executable cache: repeated driver runs skip the
        # ~20-40 s/executable tunnel compiles. Default ON since round 5
        # (BENCH_COMPILE_CACHE=0 opts out): caching only skips
        # compilation — the timed executables are identical — and a
        # cache-warm driver run fits every workload in FULL comparison
        # mode instead of lean. The dir is anchored to THIS FILE (not the
        # cwd): the first round-5 campaign runs wrote their cache wherever
        # the launcher happened to cd, so every run stayed cold.
        try:
            import jax

            cache_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "logs", "jax_cache")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
            n = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
            _log(f"compile cache: {cache_dir} ({n} entries "
                 f"{'— warm' if n else '— cold'})")
        except Exception as e:  # noqa: BLE001
            _log(f"compile cache unavailable: {e}")

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" not in result:
        reason = result.get(
            "error", f"TPU backend init timed out after {timeout_s}s "
            "(axon tunnel unreachable)")
        _log(f"backend init failed: {reason}")
        _fail_headline(reason)
        os._exit(1)
    _log(f"devices: {result['devices']}")


def _emit(tpu_fps, cpu_fps, extra, t_start):
    """Print the CUMULATIVE headline JSON (one line, flushed). Called after
    every workload so a driver timeout still leaves the latest complete
    record as the last JSON line on stdout (BENCH_r04 was rc=124 with
    parsed=null because the single final line never printed)."""
    extra = dict(extra)
    extra["bench_elapsed_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps({
        "metric": "lifted frames/sec/chip (H3.6M 2D->3D)",
        "value": round(tpu_fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
        "extra": extra,
    }), flush=True)


def main():
    import os

    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1080"))
    # BENCH_LEAN=1 forces lean mode everywhere; =0 forces full comparisons
    lean_override = os.environ.get("BENCH_LEAN")
    _init_backend_or_die()

    def remaining():
        return budget_s - (time.perf_counter() - t_start)

    try:
        tpu_fps, lift_mfu, measure_lift_xla = tpu_lifting_throughput()
    except Exception as e:  # noqa: BLE001 — one JSON line no matter what
        _log(f"lifting bench FAILED: {type(e).__name__}: {e}")
        _fail_headline(f"lifting workload failed: {type(e).__name__}: {e}")
        return
    _log(f"lifting: {tpu_fps:,.0f} frames/s/chip (fused Pallas trunk) "
         f"{lift_mfu}")
    cpu_fps = cpu_reference_throughput()
    _log(f"lifting cpu reference: {cpu_fps:,.0f} frames/s")

    extra = {
        "lifting_infer": {
            "frames_per_s": round(tpu_fps, 1),
            "vs_torch_cpu": round(tpu_fps / cpu_fps, 2),
            # filled by the deferred comparison after every workload ran
            "xla_apply_frames_per_s": "deferred",
            "config": "fused Pallas whole-trunk kernel, B=8192 bf16",
            **lift_mfu,
            "workload_s": round(time.perf_counter() - t_start, 1),
        },
    }
    _emit(tpu_fps, cpu_fps, extra, t_start)

    def direct(lean):
        direct_fps, direct_mfu = tpu_direct_train_throughput(
            both_epilogues=not lean)
        _log(f"direct train: {direct_fps:,.0f} frames/s {direct_mfu}")
        return {
            "frames_per_s": round(direct_fps, 1),
            "vs_1080ti": round(direct_fps / REF_1080TI_FPS, 2),
            "config": "R50+64^3 soft-argmax B=64 bf16",
            **direct_mfu,
        }

    def temporal_train(lean):
        temporal_fps, temporal_mfu = tpu_temporal_train_throughput(
            compare_xla=not lean)
        _log(f"temporal train: {temporal_fps:,.0f} frames/s {temporal_mfu}")
        return {
            "frames_per_s": round(temporal_fps, 1),
            "vs_baseline": None,  # reference delegates to external MotionBERT
            "config": "243-frame 5-block transformer B=8 bf16",
            **temporal_mfu,
        }

    def temporal_infer(lean):
        ti_fps, ti_xla_fps = tpu_temporal_infer_throughput(
            compare_xla=not lean)
        _log(f"temporal infer: {ti_fps:,.0f} frames/s "
             f"(xla {ti_xla_fps or 0:,.0f})")
        return {
            "frames_per_s": round(ti_fps, 1),
            "xla_apply_frames_per_s": (round(ti_xla_fps, 1) if ti_xla_fps
                                       else "skipped (budget lean mode)"),
            "vs_baseline": None,  # reference: external MotionBERT, no number
            "config": "243-frame serving, fused spatial+temporal "
                      "sub-block kernels, B=16 bf16",
        }

    def flip(lean):
        flip_fps, flip_mfu = tpu_flip_lift_throughput()
        _log(f"flip lift: {flip_fps:,.0f} frames/s {flip_mfu}")
        return {
            "frames_per_s": round(flip_fps, 1),
            # the reference runs the flip pass as a SECOND sequential
            # forward (train_5.py:153-168) => its per-frame cost doubles;
            # the torch-CPU anchor for flip-consistent lifting is cpu/2
            "vs_torch_cpu_flip": round(flip_fps / (cpu_fps / 2.0), 2),
            "config": "flip-consistency 2x-batch fused lifting, B=4096 bf16",
            **flip_mfu,
        }

    def e2e(lean):
        # spare budget beyond this workload's own floor may retrain the
        # detector checkpoint if logs/ was wiped (measured ~100 s)
        e2e_fps, e2e_extra = tpu_e2e_video_throughput(
            spare_budget_s=max(0.0, remaining() - 160.0))
        return {
            "video_frames_per_s": round(e2e_fps, 1),
            # no runnable reference anchor exists in this env: the
            # reference's phase-2 pipeline forks one OpenPifPaf subprocess
            # PER FRAME (run.py:134-166, model re-init each time) plus a
            # manual MotionBERT hand-off — order seconds/frame
            "vs_baseline": None,
            "config": "640x480 mp4 -> native decode||detect overlap -> "
                      f"fused temporal lift, {E2E_FRAMES} frames",
            **e2e_extra,
        }

    # scoreboard order with conservative cost floors (compile time through
    # the tunnel dominates); a workload only starts if it plausibly fits —
    # better an explicit "skipped" marker than the driver's rc=124.
    # (name, fn, lean-mode floor, full-mode cost) — measured COLD-cache
    # one-chip costs (2026-08-20 validation, dynamic-K single-compile
    # chains: lifting-fused ~300 s, direct-both 169 s, temporal-train-both
    # 247 s, temporal-infer-both 99 s, flip 20 s, e2e 144 s; floors carry
    # ~30% contention margin; a warm compile cache makes all of them loose)
    workloads = [
        ("direct_train", direct, 120.0, 220.0),
        ("temporal_train", temporal_train, 180.0, 320.0),
        ("temporal_infer", temporal_infer, 70.0, 130.0),
        ("flip_lift", flip, 30.0, 30.0),
        ("e2e_video", e2e, 160.0, 160.0),
    ]

    def floors_after(i):
        return sum(w[2] for w in workloads[i + 1:])

    for i, (name, fn, cost_floor, full_cost) in enumerate(workloads):
        if remaining() < cost_floor:
            _log(f"{name} SKIPPED: {remaining():.0f}s of {budget_s:.0f}s "
                 f"budget left < {cost_floor:.0f}s floor")
            extra[name] = {"skipped": f"time budget ({remaining():.0f}s "
                                      f"left < {cost_floor:.0f}s floor)"}
            _emit(tpu_fps, cpu_fps, extra, t_start)
            continue
        # lean mode: drop this workload's comparison config unless the
        # remaining budget covers its FULL cost plus every downstream floor
        lean = _lean_decision(remaining(), full_cost, floors_after(i),
                              lean_override)
        if lean and full_cost > cost_floor:
            _log(f"{name}: LEAN mode ({remaining():.0f}s left < "
                 f"{full_cost:.0f}s full cost + {floors_after(i):.0f}s "
                 f"downstream floors) — comparison config skipped")
        t_wl = time.perf_counter()
        try:
            extra[name] = fn(lean)
        except Exception as e:  # noqa: BLE001 — headline must still print
            _log(f"{name} bench FAILED: {type(e).__name__}: {e}")
            extra[name] = {"error": str(e)[:200]}
        extra[name]["workload_s"] = round(time.perf_counter() - t_wl, 1)
        _emit(tpu_fps, cpu_fps, extra, t_start)

    # deferred lifting comparison: the plain-XLA-apply chain's cold compile
    # (~4 min) is the costliest single compile in the bench and informs only
    # the fused kernel's win factor — it runs LAST, after every scoreboard
    # workload is on the record, and only if the budget still covers it.
    lift_xla_floor = 300.0
    if remaining() >= lift_xla_floor:
        try:
            xla_fps = measure_lift_xla()
            extra["lifting_infer"]["xla_apply_frames_per_s"] = round(
                xla_fps, 1)
            _log(f"lifting xla-apply comparison: {xla_fps:,.0f} frames/s "
                 f"(fused kernel win {tpu_fps / xla_fps:.2f}x)")
        except Exception as e:  # noqa: BLE001
            _log(f"lifting xla comparison FAILED: {type(e).__name__}: {e}")
            extra["lifting_infer"]["xla_apply_frames_per_s"] = (
                f"error: {str(e)[:120]}")
    else:
        extra["lifting_infer"]["xla_apply_frames_per_s"] = (
            f"skipped (time budget: {remaining():.0f}s left < "
            f"{lift_xla_floor:.0f}s floor)")
        _log(f"lifting xla comparison SKIPPED: {remaining():.0f}s left")
    _emit(tpu_fps, cpu_fps, extra, t_start)


if __name__ == "__main__":
    main()
