"""Video-frame dataset with MotionBERT pseudo-ground-truth (phase 4).

Reference contract (phase4_joined/Custom_Video_dataset.py:32-78): frames come
from the phase-2 ``ffmpeg_frames/<video>/`` extraction, labels from the
``MB_npy/<video>.npy`` (T,17,3) pseudo-GT; poses are zero-centred (:55-58);
frames get a centre square crop then 256^2 resize and /256 (:68-76); items
are (zeros(17,2), pose, frame).

Here the whole video preprocesses in one vectorized pass (crop/resize via
cv2 per frame on host, normalization on device later) and returns flat
arrays; the trainer's prefetcher streams them to HBM.
"""

from __future__ import annotations

import pathlib

import numpy as np


def load_video_dataset(pipeline_root, video: str, size: int = 256,
                       zero_centre: bool = True):
    """-> (kp2d zeros (N,17,2), poses (N,17,3), frames (N,size,size,3))."""
    import cv2

    root = pathlib.Path(pipeline_root)
    frames_dir = root / "ffmpeg_frames" / video
    npy_path = root / "MB_npy" / f"{video}.npy"
    poses = np.load(npy_path).astype(np.float32)
    if zero_centre:
        poses = poses - poses[:, :1]

    files = sorted(frames_dir.glob("*.jpg"))
    n = min(len(files), len(poses))
    frames = np.zeros((n, size, size, 3), np.float32)
    for i, f in enumerate(files[:n]):
        img = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        side = min(h, w)  # centre square crop (Custom_Video_dataset.py:68-72)
        top, left = (h - side) // 2, (w - side) // 2
        img = img[top:top + side, left:left + side]
        frames[i] = cv2.resize(img, (size, size)).astype(np.float32) / 256.0
    kp2d = np.zeros((n, 17, 2), np.float32)
    return kp2d, poses[:n], frames
