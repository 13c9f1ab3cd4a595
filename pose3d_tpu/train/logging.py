"""Metric logging: stdout + JSONL, wandb-compatible key names.

The reference logs {"loss(train)", "loss(val.)", "MPJPE(train)",
" MPJPE(val.)"} per epoch to wandb (train_1.py:151, note the leading space in
the val-MPJPE key — kept for log-parity) plus a printed f-string
(train_3.py:154). Here every run writes ``logs/runs/<run_name>.jsonl`` (one
JSON object per epoch) and prints the same line; wandb is used when the
package is importable and WANDB=1 (never required — this environment has no
egress).
"""

from __future__ import annotations

import json
import os
import pathlib
import time


class MetricLogger:
    WANDB_KEYS = {
        "train_loss": "loss(train)",
        "val_loss": "loss(val.)",
        "train_mpjpe": "MPJPE(train)",
        "val_mpjpe": " MPJPE(val.)",
    }

    def __init__(self, log_dir, run_name: str, config: dict | None = None,
                 use_wandb: bool | None = None):
        self.run_name = run_name
        self.path = pathlib.Path(log_dir) / "runs" / f"{run_name}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.t0 = time.time()
        self._wandb = None
        if use_wandb is None:
            use_wandb = os.environ.get("WANDB", "0") == "1"
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="loop", name=run_name, config=config or {})
            except Exception:
                self._wandb = None
        if config:
            self._write({"event": "config", **config})

    def _write(self, record: dict):
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_epoch(self, epoch: int, n_epochs: int, train_loss: float,
                  train_mpjpe: float, val_loss: float, val_mpjpe: float,
                  **extra):
        rec = {
            "epoch": epoch + 1,
            "train_loss": train_loss,
            "train_mpjpe": train_mpjpe,
            "val_loss": val_loss,
            "val_mpjpe": val_mpjpe,
            "_runtime": round(time.time() - self.t0, 2),
            **extra,
        }
        self._write(rec)
        if self._wandb is not None:
            self._wandb.log({
                self.WANDB_KEYS["train_loss"]: train_loss,
                self.WANDB_KEYS["val_loss"]: val_loss,
                self.WANDB_KEYS["train_mpjpe"]: train_mpjpe,
                self.WANDB_KEYS["val_mpjpe"]: val_mpjpe,
            })
        # the reference's per-epoch print (train_1.py:154)
        print(
            f"epoch {epoch + 1}/{n_epochs} loss(train): {train_loss:.4f} , "
            f"MPJPE(train):{train_mpjpe}, loss(val.): {val_loss}, "
            f"MPJPE(val.){val_mpjpe}",
            flush=True,
        )

    def finish(self):
        self._write({"event": "finish", "_runtime": round(time.time() - self.t0, 2)})
        if self._wandb is not None:
            self._wandb.finish()
