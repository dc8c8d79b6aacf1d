#!/usr/bin/env python
"""A/B the two round-2 changes implicated in the PointNet++ partseg
regression (VERDICT r2 #2: 1025 -> 880 samples/s): the fused-SA slot-
cap cond chain (POINTCLOUDLIB_SA_RUNGS=0 disables) and the fused 3-NN
interpolation route in the FP decoders (POINTCLOUDLIB_FUSED_3NN=0
falls back to knn+index_points). Each arm runs in a fresh subprocess
(gates are read at trace time) on the real chip; the headline cls
workload rides along so a partseg-motivated default change can't
silently regress it.

Run: python scripts/bench_partseg_ab.py [--repeats N]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM = """
import sys
sys.path.insert(0, {root!r})
import importlib
bench = importlib.import_module("bench")
kind, spec = {spec!r}
if kind == "seg":
    sps = bench._bench_partseg(*spec)
else:
    sps = bench._bench_cls(*spec)
print("RESULT", round(sps, 1), flush=True)
"""

SPECS = {
    "partseg_pointnet2": ("seg", ("pointnet2", True)),
    "cls_ssg_headline": ("cls", ("pointnet2", 64, 1024, True, 30)),
}
GATES = {
    "default": {},
    "rungs_off": {"POINTCLOUDLIB_SA_RUNGS": "0"},
    "3nn_xla": {"POINTCLOUDLIB_FUSED_3NN": "0"},
    "both_off": {"POINTCLOUDLIB_SA_RUNGS": "0",
                 "POINTCLOUDLIB_FUSED_3NN": "0"},
}


def run(spec, gates):
    env = dict(os.environ, **gates)
    out = subprocess.run(
        [sys.executable, "-c", ARM.format(root=ROOT, spec=spec)],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[-1])
    print(out.stdout[-1500:], file=sys.stderr)
    print(out.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"arm {gates} produced no RESULT")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=1)
    p.add_argument("--only", default=None,
                   help="comma list of workloads and/or gate arms")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None
    for wname, spec in SPECS.items():
        if only and wname not in only and not (only & set(GATES)):
            continue
        for gname, gates in GATES.items():
            if only and gname not in only and wname not in only:
                continue
            vals = [run(spec, gates) for _ in range(args.repeats)]
            print(json.dumps({
                "workload": wname, "arm": gname,
                "samples_per_sec": statistics.median(vals),
                "runs": vals,
            }), flush=True)


if __name__ == "__main__":
    main()
