"""A/B step bench of POINTCLOUDLIB_CAP_GATHER on the real chip.

Times the two workloads the gather-pass slot-capping targets —
PointNet++ SSG headline (B=64, N=1024, external-idx gather route at
SA1 k=32) and MSG (k=128 scale) — with the gate off and on, in two
separate subprocesses (the gate is read at trace time; a fresh process
per arm avoids stale-cache hazards entirely). Each arm runs
``--repeats`` times (default 2) and reports the MEDIAN, so single-run
tunnel/dispatch variance doesn't masquerade as a gate delta.

Run: python scripts/bench_cap_gather_ab.py [--repeats N]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM = """
import sys, time
sys.path.insert(0, {root!r})
import importlib
bench = importlib.import_module("bench")
model, bs, n, normals, iters = {spec}
sps = bench._bench_cls(model, bs, n, normals, iters=iters)
print("RESULT", {name!r}, round(sps, 1), flush=True)
"""

SPECS = {
    "ssg_b64_n1024": ("pointnet2", 64, 1024, True, 30),
    "msg_b32_n1024": ("pointnet2_msg", 32, 1024, True, 15),
}


def run(name, spec, cap):
    env = dict(os.environ)
    env["POINTCLOUDLIB_CAP_GATHER"] = "1" if cap else "0"
    code = ARM.format(spec=repr(spec), name=name, root=ROOT)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=ROOT,
        capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[-1])
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-4000:], file=sys.stderr)
    raise RuntimeError(f"{name} cap={cap} produced no RESULT")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repeats", type=int, default=2,
                   help="runs per arm; the MEDIAN is reported")
    args = p.parse_args()
    results = {}
    for name, spec in SPECS.items():
        # interleave the arms (off/on/off/on…) so slow tunnel drift
        # hits both equally
        runs = {False: [], True: []}
        for _ in range(args.repeats):
            for cap in (False, True):
                sps = run(name, spec, cap)
                runs[cap].append(sps)
                print(json.dumps({"arm": name, "cap_gather": cap,
                                  "samples_per_sec": sps}), flush=True)
        for cap in (False, True):
            results[f"{name}_cap{int(cap)}"] = statistics.median(runs[cap])
    for name in SPECS:
        a, b = results[f"{name}_cap0"], results[f"{name}_cap1"]
        print(f"{name} (median of {args.repeats}): {a:.1f} -> {b:.1f} "
              f"sa/s ({(b / a - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
