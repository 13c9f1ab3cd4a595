"""Probe: ResNet stem 7x7/s2 conv vs its space-to-depth rewrite, on chip.

The direct-train roofline (campaign_r4/DIRECT_ROOFLINE.md) pinned the step
conv-bound with the R50 backbone at 30.5% MFU and named the 7x7/stride-2
stem as one of the poorly-tiling shapes: 3 input channels fill ~2% of the
MXU's 128-deep contraction and stride 2 halves tile reuse.

The classic TPU fix (MLPerf-era ResNet): a 7x7/s2 conv on (H, W, 3) is
EXACTLY a 4x4/s1 conv on the 2x2 space-to-depth input (H/2, W/2, 12):

    y[i,j,o] = sum_{u,v,c} w[u,v,c,o] * x[2i+u-3, 2j+v-3, c]

substitute u = 2a + dy - 1 (a in 0..3, dy in 0..1; u=-1 and u=7 fall on
zero-padded kernel rows), likewise v = 2b + dx - 1:

    y[i,j,o] = sum_{a,b,(dy,dx,c)} w2[a,b,(dy,dx,c),o] * x2[i+a-2, j+b-2, (dy,dx,c)]

with x2 the 2x2-depth-blocked input and w2 the kernel zero-padded 7->8 at
the FRONT of both spatial dims and reshaped (8,8,3,64)->(4,4,12,64).
Stride 1, padding ((2,1),(2,1)). 12 input channels, 4x the tap reuse per
MXU pass — identical math, f32-exact.

This script (a) asserts exactness on chip in f32, (b) two-K-times the
stem fwd+dW in both forms at the direct-train shape (B=64, 256x256 bf16,
dW only — the stem's input needs no gradient).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/stem_s2d_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _compile_chain, _two_k

B, H = 64, 256


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def kernel_s2d(w):
    """(7,7,3,64) HWIO -> the exact (4,4,12,64) s2d-form kernel."""
    w = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # front-pad 7->8
    kh, kw, c, o = w.shape
    w = w.reshape(kh // 2, 2, kw // 2, 2, c, o)  # (a, dy, b, dx, c, o)
    return w.transpose(0, 2, 1, 3, 4, 5).reshape(kh // 2, kw // 2, 4 * c, o)


def conv_base(w, x):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2d(w2, x2):
    return jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # ---- exactness (f32, small) ------------------------------------------
    xs = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    ws = jnp.asarray(rng.random((7, 7, 3, 64), np.float32) - 0.5)
    y0 = jax.jit(conv_base)(ws, xs)
    y1 = jax.jit(lambda w, x: conv_s2d(kernel_s2d(w), s2d(x)))(ws, xs)
    err = float(jnp.max(jnp.abs(y0 - y1)))
    rel = err / float(jnp.max(jnp.abs(y0)))
    print(f"exactness: shape {y1.shape} vs {y0.shape}, max abs err {err:.3e}"
          f" (rel {rel:.3e})")
    assert y0.shape == y1.shape and rel < 1e-5

    # ---- timing: fwd + dW at the direct-train shape, bf16 ----------------
    x = jnp.asarray(rng.random((B, H, H, 3), np.float32) * 2 - 1,
                    dtype=jnp.bfloat16)

    def make_step(conv, reshape_x, kshape):
        def loss(w, x):
            y = conv(w, reshape_x(x))
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        g = jax.grad(loss)

        def chain(w, x, k):
            def body(_, carry):
                w, _s = carry
                dw = g(w, x)
                w = w - dw.astype(w.dtype) * 1e-6
                return w, dw.reshape(-1)[0].astype(jnp.float32)

            w, s = jax.lax.fori_loop(0, k, body, (w, jnp.float32(0.0)))
            return w, s

        w0 = jnp.asarray(rng.random(kshape, np.float32) - 0.5,
                         dtype=jnp.bfloat16)
        return chain, w0

    results = {}
    for label, conv, rx, kshape in [
        ("base7x7s2", conv_base, lambda x: x, (7, 7, 3, 64)),
        ("s2d4x4s1", conv_s2d, s2d, (4, 4, 12, 64)),
        # s2d done ONCE outside the loop (the model would fold it into the
        # input pipeline / normalization step): kernel-form only
        ("s2d_pre", conv_s2d, lambda x: x, (4, 4, 12, 64)),
    ]:
        xx = s2d(x) if label == "s2d_pre" else x
        chain, w0 = make_step(conv, rx, kshape)
        _, runner = _compile_chain(chain, w0, xx, label=label)
        per, t1, t2 = _two_k(runner(20), runner(120), 20, 120, repeats=5)
        print(f"{label}: {per*1e3:.3f} ms/iter (fwd+dW, B={B})")
        results[label] = per

    base = results["base7x7s2"]
    for k, v in results.items():
        print(f"  {k}: {v*1e3:.3f} ms  ({base/v:.2f}x vs base)")


if __name__ == "__main__":
    main()
