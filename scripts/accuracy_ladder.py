#!/usr/bin/env python
"""Synthetic convergence ladder: every model family trains a fixed
short budget on the procedural synthetic datasets and must clear a
per-family accuracy floor.

This is the regression net for training DYNAMICS (round-1 VERDICT item
7): logits-parity and kernel tests catch math bugs, but a silent
optimizer/BN/schedule regression that merely slows convergence would
pass them — and would show up here as a missed floor. The floors are
measured values minus a margin (see FLOORS below; re-baseline with
``--record`` after intentional changes).

Usage:
    python scripts/accuracy_ladder.py            # assert floors
    python scripts/accuracy_ladder.py --record   # print measured table
    make accuracy

Results land in accuracy_ladder.jsonl (one line per model per run).
The de-facto integration test this replaces is the reference's README
accuracy table (README.md:56-98) — unreachable here (zero egress), so
the synthetic proxy is the budget-bounded stand-in.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# (task, model, extra CLI args, floor %). Round 5: every floor with a
# torch mirror row cites it (mirror_ladder.jsonl, same budget/seed;
# scripts/mirror_floors.py audits floor vs 0.8·mirror−3). Floors
# stricter than mirror-derived keep our higher measured value — a
# regression to mere mirror level should still fail. Exceptions
# documented inline: kpconv has no full-model torch mirror (op-level
# parity only); the MSG mirror costs ~3 h/epoch on this 1-core host
# (docs/DESIGN.md r5) so its floor stays anchored to the SSG mirror.
LADDER = [
    ("cls", "pointnet", [], 32.0),        # measured 40.62, mirror 44.53
    ("cls", "pointnet2", [], 30.0),       # measured 38.28, mirror 39.84
    ("cls", "pointnet2_msg", [], 34.0),   # measured 42.97; no mirror
    #                           (infeasible budget); SSG mirror 39.84
    ("cls", "dgcnn", [], 36.0),           # measured 46.09, mirror 44.53
    ("cls", "pointcnn", [], 38.0),        # measured 47.66, mirror
    #                           52.34 (spike epoch in a ±5-noise curve;
    #                           neighbors 39.06/38.28 — see
    #                           scripts/probe_pointcnn_gap.py)
    # re-based round 3: reference_linear_init (intentional parity,
    # nn/layers.py:32) slows the 10-epoch budget for this family — the
    # reference-keyed torch mirror itself lands 31.25 best OA here
    # (scripts/probe_pointconv_cls_convergence.py); ours measured
    # 25.0-29.7 under the matched init (and 35.9 with the old lecun
    # init via POINTCLOUDLIB_REF_INIT=0), ±5 trajectory noise.
    # Round 4 (VERDICT r3 weak #7): the 10-epoch floor of 22 sat BELOW
    # the ±5 noise band — this row now gets the 40-epoch budget its seg
    # sibling got so the floor clears the noise. Measured 59.38 at 40
    # epochs (accuracy_ladder.jsonl r4); floor = 0.8·measured − 3,
    # same margin convention as the mirror-derived floors.
    ("cls", "pointconv", ["--epochs", "40"], 44.0),  # measured 59.38;
    #                           mirror 31.25 at the 10-epoch budget
    ("cls", "kpconv", [], 38.0),          # measured 47.66; no mirror
    ("cls", "kpconv_deform", [], 36.0),   # measured 45.31 (frozen
    #                           offsets); no mirror
    ("seg", "pointnet", [], 38.0),        # measured 48.51, mirror 47.37
    ("seg", "pointnet2", [], 70.0),       # measured 87.51, mirror 85.81
    # tightened r5: the seg/dgcnn mirror lands 86.38 — the old 59
    # floor (our 74.00 − 20%) sat BELOW 0.8·mirror−3 = 66.1, i.e. a
    # regression to well under mirror level would have passed
    ("seg", "dgcnn", [], 66.0),           # measured 74.00, mirror 86.38
    ("seg", "pointcnn", [], 34.0),        # measured 42.68, mirror 42.40
    # pointconv partseg converges slowly (head dropout 0.4 on a
    # 256-item budget + deepest encoder/decoder; the reference-keyed
    # torch mirror shows the same family behavior — see
    # scripts/probe_pointconv_seg_convergence.py) — it gets a longer
    # budget so the floor means something (measured 46.25 at 40 epochs,
    # round 3; mirror 49.31 at the same 40-epoch budget, r5 ⇒
    # 0.8·49.31−3 = 36.5)
    ("seg", "pointconv", ["--epochs", "40"], 36.5),
]

CLS_BUDGET = ["--synthetic", "--synthetic-size", "512", "--epochs", "10",
              "--batch_size", "32", "--num_points", "512"]
SEG_BUDGET = ["--synthetic", "--synthetic-size", "256", "--epochs", "10",
              "--batch_size", "16", "--num_points", "1024"]


def run_one(task: str, model: str, extra) -> float:
    cli = "train_cls.py" if task == "cls" else "train_partseg.py"
    budget = CLS_BUDGET if task == "cls" else SEG_BUDGET
    cmd = [sys.executable, str(ROOT / cli), "--model", model,
           *budget, *extra]
    out = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True, timeout=3600
    )
    text = out.stdout + out.stderr
    pat = r"best (?:OA|IoU): ([0-9.]+)%"
    m = re.findall(pat, text)
    if out.returncode != 0 or not m:
        tail = "\n".join(text.strip().splitlines()[-15:])
        raise RuntimeError(f"{task}/{model} failed:\n{tail}")
    return float(m[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="measure and print; do not assert floors")
    ap.add_argument("--only", default=None,
                    help="comma-separated model filter; entries may be "
                         "qualified as task/model (e.g. cls/pointconv) "
                         "to select one row of a family that appears "
                         "in both tasks")
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    log = ROOT / "accuracy_ladder.jsonl"
    failures = []
    for task, model, extra, floor in LADDER:
        if only and model not in only and f"{task}/{model}" not in only:
            continue
        t0 = time.time()
        try:
            acc = run_one(task, model, extra)
        except Exception as e:
            failures.append(f"{task}/{model}: {e}")
            print(f"{task:3s} {model:16s} ERROR ({e})", flush=True)
            continue
        dt = time.time() - t0
        ok = args.record or floor is None or acc >= floor
        print(f"{task:3s} {model:16s} {acc:6.2f}%"
              f"  floor={floor}  [{'ok' if ok else 'FAIL'}]"
              f"  ({dt:.0f}s)", flush=True)
        with log.open("a") as f:
            f.write(json.dumps({
                "ts": time.time(), "task": task, "model": model,
                "metric": acc, "floor": floor, "seconds": round(dt, 1),
            }) + "\n")
        if not ok:
            failures.append(f"{task}/{model}: {acc:.2f} < floor {floor}")
    if failures and not args.record:
        print("FAILURES:\n  " + "\n  ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
