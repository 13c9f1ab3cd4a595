"""H36M-scale batched 2D detection over pre-extracted frame trees.

Reference contract: phase2_opp_mb/run.py:354-393 (``run_openpifpaf_H36``:
walk ``<data>/videos/<S>/outputVideos/<action>/``, one detector subprocess
PER FRAME) and :395-447 (``save_to_json_H36``: merge per-action JSONs into
``final_json_outputs/<S>/<action>.json``).

Redesign: the detector interface is batched (one invocation per action
directory), so a full subject processes in N_actions calls instead of
N_frames; output layout and JSON schema are unchanged.
"""

from __future__ import annotations

import pathlib

from pose3d_tpu.pipeline.keypoints import save_to_json


def detect_h36m_tree(data_root, out_root, detector, subjects=("S1",),
                     already_h36m: bool = False):
    """Run detection over every action of every subject; returns the list of
    consolidated JSON paths written."""
    data_root, out_root = pathlib.Path(data_root), pathlib.Path(out_root)
    written = []
    for s in subjects:
        subject_dir = data_root / "videos" / s / "outputVideos"
        if not subject_dir.exists():
            print(f"{subject_dir} not a directory")
            continue
        for action_dir in sorted(p for p in subject_dir.iterdir() if p.is_dir()):
            jsons_dir = out_root / "opp_outputs" / s / action_dir.name
            detector.detect_dir(action_dir, jsons_dir)
            final = out_root / "final_json_outputs" / s / f"{action_dir.name}.json"
            save_to_json(jsons_dir, final, already_h36m)
            written.append(final)
            print(f"{s}/{action_dir.name}: -> {final}")
    return written
