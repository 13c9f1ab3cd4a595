"""Detection-JSON merge + COCO->H36M remap + npy interchange.

Reference contract (phase2_opp_mb/run.py:60-110 ``save_to_json``): for each
per-frame OpenPifPaf JSON, take the max-score person, remap its keypoints
COCO->H36M, and append {"image_id": <file>, "category_id": 1, "keypoints":
(17,3) nested list incl. confidence, "score": max_score} — one consolidated
JSON per video (format verified against final_json_outputs/*.json). Frames
with no detections contribute a zero (17,3) entry with score 0 (run.py:82,92).

The MotionBERT hand-off artifacts are (T,17,3) float32 npy files
(run.py:475-478, MB_npy/*.npy); :func:`load_mb_npy`/:func:`save_mb_npy` keep
that interchange format so existing assets drop in.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from pose3d_tpu.core.skeleton import coco_to_h36m


def merge_detections(json_dir, already_h36m: bool = False):
    """Per-frame prediction JSONs -> list of reference-schema records."""
    records = []
    for f in sorted(pathlib.Path(json_dir).glob("*.json")):
        with open(f) as fh:
            people = json.load(fh)
        kp = np.zeros((17, 3))
        score = 0.0
        if people:
            best = max(people, key=lambda p: p.get("score", 0.0))
            score = float(best.get("score", 0.0))
            kp = np.asarray(best["keypoints"], dtype=np.float64).reshape(17, 3)
            if not already_h36m:
                kp[:, :2] = coco_to_h36m(kp[:, :2])
        records.append({
            "image_id": f.name,
            "category_id": 1,
            "keypoints": kp.tolist(),
            "score": score,
        })
    return records


def save_to_json(json_dir, out_path, already_h36m: bool = False):
    records = merge_detections(json_dir, already_h36m)
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(records, fh)
    return records


def load_video_json(path):
    """Consolidated video JSON -> ((T,17,2) keypoints px, (T,17) conf,
    (T,) scores)."""
    with open(path) as fh:
        records = json.load(fh)
    kp = np.asarray([r["keypoints"] for r in records], dtype=np.float32)
    scores = np.asarray([r["score"] for r in records], dtype=np.float32)
    return kp[..., :2], kp[..., 2], scores


def rotate_to_global(poses, subject: str = "S1", camera: int = 2):
    """Rotate camera-frame (T,17,3) sequences into the global frame using an
    H36M camera orientation (the create_3d_mp4 convention, run.py:305-335:
    data @ R.T with R from the camera quaternion)."""
    import jax.numpy as jnp

    from pose3d_tpu.core.cameras import extrinsics
    from pose3d_tpu.core.quaternion import quat_to_rotmat

    q, _ = extrinsics(subject, camera)
    r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    return np.asarray(poses) @ r.T


def save_mb_npy(poses, out_path):
    """(T,17,3) float32 npy — the MotionBERT interchange format."""
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.save(out_path, np.asarray(poses, dtype=np.float32))


def load_mb_npy(path):
    arr = np.load(path)
    assert arr.ndim == 3 and arr.shape[1:] == (17, 3), arr.shape
    return arr.astype(np.float32)
