"""Apply on-chip ladder results to the shipped kernel constants.

Parses the round-4 campaign ladder logs and rewrites the module-level
constants that the ladders swept, so every later campaign stage — and the
driver's own end-of-round ``bench.py`` run — executes with the measured
winners even if nobody is around to hand-retune:

  train_bwd_ladder.log  "full train step, chunk  136:  30.12 ms (...)"
      -> pose3d_tpu/ops/pallas_stblock_train.py  ATTN_CHUNK
  rows_ladder.log       "lifter B=8192 ROWS= 272: ..."
      -> pose3d_tpu/ops/pallas_lifter.py         ROWS
                        "serving C=16 spatial ROWS= 544: ..."
      -> pose3d_tpu/ops/pallas_stblock.py        ROWS
                        "train B=8 TRAIN_ROWS= 272: ..."
      -> pose3d_tpu/ops/pallas_stblock_train.py  TRAIN_ROWS

Decision rule (campaign README): a winner is applied only when it beats
the currently-shipped constant's own measured row by >= MARGIN (5%).
Rows the ladder did not produce (crash, timeout) leave the constant
untouched.  ``chunk off`` means full-width scores: ATTN_CHUNK is set to
the (possibly just-updated) TRAIN_ROWS value, which the kernels' fallback
predicate (ATTN_CHUNK >= rows) treats as "no chunking".

Default is a dry run printing decisions; --apply edits the sources.

Run: python experiments/apply_tuning.py [--apply] [--dir experiments/campaign_r4]
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
MARGIN = 0.05

STBLOCK_TRAIN = REPO / "pose3d_tpu/ops/pallas_stblock_train.py"
LIFTER = REPO / "pose3d_tpu/ops/pallas_lifter.py"
STBLOCK = REPO / "pose3d_tpu/ops/pallas_stblock.py"


def log(m):
    print(m, flush=True)


def parse_rows(path: pathlib.Path, pattern: str) -> dict[str, float]:
    """Return {label: milliseconds} for every line matching ``pattern``.

    ``pattern`` must have two groups: the swept value's label and the ms
    figure.  Later duplicates win (a rerun appends to the same log).
    """
    if not path.exists():
        return {}
    out: dict[str, float] = {}
    for line in path.read_text().splitlines():
        m = re.search(pattern, line)
        if m:
            out[m.group(1).strip()] = float(m.group(2))
    return out


def current_constant(path: pathlib.Path, name: str) -> int:
    m = re.search(rf"(?m)^{name} = (\d+)", path.read_text())
    if not m:
        raise SystemExit(f"constant {name} not found in {path}")
    return int(m.group(1))


def set_constant(path: pathlib.Path, name: str, value: int, apply: bool):
    text = path.read_text()
    new, n = re.subn(rf"(?m)^{name} = \d+", f"{name} = {value}", text, count=1)
    if n != 1:
        raise SystemExit(f"constant {name} not found in {path}")
    if apply:
        path.write_text(new)
    log(f"  -> {path.relative_to(REPO)}: {name} = {value}"
        f"{'' if apply else '  (dry run)'}")


def decide(rows: dict[str, float], current_label: str) -> str | None:
    """Best label if it beats the current one by >= MARGIN, else None."""
    if not rows or current_label not in rows:
        if rows:
            log(f"  current value {current_label!r} has no measured row "
                f"{sorted(rows)} — leaving untouched")
        return None
    best = min(rows, key=rows.get)
    cur_ms, best_ms = rows[current_label], rows[best]
    verdict = (f"best {best!r} {best_ms:.2f} ms vs current "
               f"{current_label!r} {cur_ms:.2f} ms")
    if best != current_label and best_ms <= cur_ms * (1 - MARGIN):
        log(f"  {verdict}: RETUNE ({(cur_ms / best_ms - 1) * 100:.1f}% win)")
        return best
    log(f"  {verdict}: keep (margin < {MARGIN:.0%})")
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true",
                    help="edit the source files (default: dry run)")
    ap.add_argument("--dir", default="experiments/campaign_r4",
                    help="campaign log directory")
    args = ap.parse_args(argv)
    d = REPO / args.dir

    # ---- TRAIN_ROWS first: the chunk "off" sentinel depends on it
    log("train TRAIN_ROWS (rows_ladder):")
    rows = parse_rows(d / "rows_ladder.log",
                      r"train B=\d+ TRAIN_ROWS=\s*(\d+):\s*([\d.]+) ms")
    cur = current_constant(STBLOCK_TRAIN, "TRAIN_ROWS")
    pick = decide(rows, str(cur))
    train_rows = int(pick) if pick else cur
    if pick:
        set_constant(STBLOCK_TRAIN, "TRAIN_ROWS", train_rows, args.apply)

    # ---- train ATTN_CHUNK (train_bwd_ladder full-step rows)
    log("train ATTN_CHUNK (train_bwd_ladder):")
    rows = parse_rows(d / "train_bwd_ladder.log",
                      r"full train step, chunk\s+(\S+):\s*([\d.]+) ms")
    cur = current_constant(STBLOCK_TRAIN, "ATTN_CHUNK")
    cur_label = "off" if cur >= train_rows else str(cur)
    pick = decide(rows, cur_label)
    if pick:
        val = train_rows if pick == "off" else int(pick)
        if pick != "off" and (train_rows % val or val % 17):
            log(f"  chunk {val} does not tile TRAIN_ROWS={train_rows} "
                "in 17-token frames — refusing")
        else:
            set_constant(STBLOCK_TRAIN, "ATTN_CHUNK", val, args.apply)

    # ---- lifter ROWS
    log("lifter ROWS (rows_ladder):")
    rows = parse_rows(d / "rows_ladder.log",
                      r"lifter B=\d+ ROWS=\s*(\d+):\s*([\d.]+) ms")
    cur = current_constant(LIFTER, "ROWS")
    pick = decide(rows, str(cur))
    if pick:
        set_constant(LIFTER, "ROWS", int(pick), args.apply)

    # ---- serving spatial ROWS
    log("serving ROWS (rows_ladder):")
    rows = parse_rows(d / "rows_ladder.log",
                      r"serving C=\d+ spatial ROWS=\s*(\d+):\s*([\d.]+) ms")
    cur = current_constant(STBLOCK, "ROWS")
    pick = decide(rows, str(cur))
    if pick:
        set_constant(STBLOCK, "ROWS", int(pick), args.apply)

    log("done" + ("" if args.apply else " (dry run — use --apply to edit)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
