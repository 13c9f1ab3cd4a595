"""Sequence lifting inference: video 2D-keypoint JSON -> (T,17,3) npy.

Replaces the reference's manual external hand-off
(``python3 infer_wild.py --vid_path ... --json_path ... --out_path``,
run.py:475-478) with the native temporal transformer: keypoints are
normalized to image coordinates, chunked into overlapping clips, lifted in
one batched jitted call, and the overlapping predictions averaged back into
a (T,17,3) float32 sequence saved in the MB_npy interchange format.
"""

from __future__ import annotations

import functools

import numpy as np

from pose3d_tpu.models.temporal import TemporalLifter, make_clips
from pose3d_tpu.pipeline.keypoints import load_video_json, save_mb_npy


@functools.cache
def _fused_infer():
    """Module-level jit of the fused serving forward. Defining the jit
    inside lift_sequence made EVERY call a fresh python callable — jax's
    compile cache keys on callable identity, so each video recompiled the
    whole 10-kernel forward (~7s, measured as the dominant stage of the
    e2e bench, ROUND3_NOTES)."""
    import jax

    from pose3d_tpu.ops.pallas_stblock import temporal_forward_fused

    return jax.jit(temporal_forward_fused,
                   static_argnames=("n_blocks", "clip_len"))


@functools.cache
def _xla_infer():
    import jax

    def infer(model, p, x):
        return model.apply({"params": p}, x, train=False)

    return jax.jit(infer, static_argnums=0)  # flax modules hash by config


def lift_sequence(params, model: TemporalLifter, kp2d_px: np.ndarray,
                  image_size: float = 1000.0, stride: int | None = None,
                  use_pallas: bool | None = None):
    """(T,17,2) pixel keypoints -> (T,17,3) lifted sequence.

    Clips of ``model.clip_len`` frames with ``stride`` overlap (default:
    clip_len//2); overlapping frame predictions are averaged; every frame
    is covered (``clip_starts`` anchors a final window at the tail).
    ``use_pallas``: None (default) auto-enables the Pallas serving path on
    TPU — the fully-fused forward (2.03x the XLA apply, ROUND2_NOTES) for
    the default architecture, the packed-attention kernels otherwise —
    but ONLY for a bfloat16 model: the fused kernels compute in bf16, and
    an f32 model must keep f32 numerics unless the caller explicitly opts
    in (outputs shift ~1e-2 relative otherwise, which can move MPJPE
    evaluations run through this path). Forcing True is honored only on a
    TPU backend (the kernels do not lower elsewhere); False always forces
    plain XLA.
    """
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.models.temporal import clip_starts

    t_total = kp2d_px.shape[0]
    if t_total == 0:
        return np.zeros((0, 17, 3), np.float32)
    clip_len = min(model.clip_len, t_total)
    stride = stride or max(clip_len // 2, 1)
    kp = (kp2d_px / image_size).astype(np.float32)

    clips = make_clips(kp, clip_len, stride)

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and model.dtype == jnp.bfloat16)
    use_pallas = use_pallas and jax.default_backend() == "tpu"

    if (use_pallas and clip_len == model.clip_len and model.hidden == 256
            and model.heads == 8 and model.n_joints == 17):
        # fully-fused serving forward: spatial + temporal sub-block
        # megakernels — 2.6x the XLA apply at B=16 (ROUND3_NOTES);
        # params identical, only the compute path moves
        out = np.asarray(_fused_infer()(
            params, jnp.asarray(clips), n_blocks=model.n_blocks,
            clip_len=model.clip_len))  # (C, L, 17, 3)
    else:
        if use_pallas != model.use_pallas:
            import dataclasses

            model = dataclasses.replace(model, use_pallas=use_pallas)

        out = np.asarray(_xla_infer()(model, params, jnp.asarray(clips)))

    acc = np.zeros((t_total, 17, 3), np.float32)
    cnt = np.zeros((t_total, 1, 1), np.float32)
    for c, s in zip(out, clip_starts(t_total, clip_len, stride)):
        end = min(s + clip_len, t_total)
        acc[s:end] += c[: end - s]
        cnt[s:end] += 1.0
    assert cnt.min() >= 1.0, "internal: some frame covered by no clip"
    return acc / cnt


def lift_video_json(params, model: TemporalLifter, json_path, out_npy_path,
                    image_size: float = 1000.0):
    kp2d, _, _ = load_video_json(json_path)
    poses = lift_sequence(params, model, kp2d, image_size)
    save_mb_npy(poses, out_npy_path)
    return poses
