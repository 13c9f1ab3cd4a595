"""Benchmark: lifted frames/sec/chip (H3.6M 2D->3D), vs the CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology (important on this tunneled-TPU environment):
- ``block_until_ready`` does NOT fence execution through the axon tunnel and
  per-call dispatch costs tens of ms, so per-call timing loops measure
  nothing. The lifter forward is therefore iterated ON DEVICE inside a
  ``lax.scan`` (each iteration's input depends on the previous output, so no
  step can be elided), fenced by materializing a scalar to host.
- Two scan lengths K1 < K2 are timed and the per-iteration time is
  (t2 - t1) / (K2 - K1): the (large, variable) tunnel round-trip and any
  constant overhead cancel.
- Baseline: a torch implementation of the same architecture on CPU (the
  reference stack is torch; BASELINE.json's metric is throughput vs the CPU
  reference), measured live in-process.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 8192
K1, K2 = 30, 180


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _chain_fn(model, k):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(params, kp):
        def body(kp, _):
            out = model.apply({"params": params}, kp, train=False)
            # data dependence: next input derives from this output
            return kp + out[..., :2] * 1e-3, out[0, 0, 0]

        kp, samples = lax.scan(body, kp, None, length=k)
        return kp, samples[-1]

    return chain


def tpu_lifting_throughput() -> float:
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.lifters import JointTransformerLifter

    model = JointTransformerLifter(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, 17, 2)).astype(np.float32))
    params = model.init({"params": jax.random.key(0)}, x, train=False)["params"]

    chain1, chain2 = _chain_fn(model, K1), _chain_fn(model, K2)

    def fenced(fn):
        _, s = fn(params, x)
        return float(s)  # host materialization is the only reliable fence

    fenced(chain1)  # compile
    fenced(chain2)
    t0 = time.perf_counter()
    fenced(chain1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    fenced(chain2)
    t2 = time.perf_counter() - t0
    per_iter = (t2 - t1) / (K2 - K1)
    _log(f"bench: K{K1} {t1 * 1e3:.0f} ms, K{K2} {t2 * 1e3:.0f} ms "
         f"-> {per_iter * 1e3:.3f} ms/iter (RTT cancelled)")
    if per_iter <= 0:  # timing noise swamped the delta; fall back to K2 raw
        per_iter = t2 / K2
        _log("bench: negative delta, using raw K2 time (upper bound)")
    return BATCH / per_iter


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
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(CPU_ITERS):
            model(x)
        dt = time.perf_counter() - t0
    return CPU_BATCH * CPU_ITERS / dt


def main():
    tpu_fps = tpu_lifting_throughput()
    _log(f"bench: tpu {tpu_fps:,.0f} frames/s/chip")
    cpu_fps = cpu_reference_throughput()
    _log(f"bench: cpu reference {cpu_fps:,.0f} frames/s")
    print(json.dumps({
        "metric": "lifted frames/sec/chip (H3.6M 2D->3D)",
        "value": round(tpu_fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
    }))


if __name__ == "__main__":
    main()
