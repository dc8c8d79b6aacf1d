"""CLI voting-eval smoke (reference classification_test,
train_cls.py:230-328): ``--eval --votes N`` must run the re-augmented
incremental-probability-average loop end-to-end — the generic path
(re-augmented dataset passes) and the KPConv path (fresh potentials +
kpconv_augment per vote, incl. the bucketed merged-shape eval model).

Runs the real CLI in a subprocess on the CPU platform (synthetic data;
no checkpoint — voting an untrained model is fine for the smoke)."""

import os
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run_cli(args, timeout=900):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # drop the suite's 8-virtual-device flag: the CLI smoke runs
    # single-device (DP eval is covered by the harness tests)
    env["XLA_FLAGS"] = ""
    res = subprocess.run(
        [sys.executable, "train_cls.py", *args],
        cwd=ROOT, env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    return res.stdout


def test_eval_voting_generic(tmp_path):
    out = _run_cli([
        "--model", "pointnet", "--synthetic", "--synthetic-size", "32",
        "--eval", "--votes", "2", "--batch_size", "8",
        "--num_points", "128", "--checkpoint-dir", str(tmp_path),
    ])
    m = re.search(r"eval OA \(2 votes\): ([0-9.]+)%", out)
    assert m, out
    assert 0.0 <= float(m.group(1)) <= 100.0


def test_eval_voting_kpconv_bucketed(tmp_path):
    out = _run_cli([
        "--model", "kpconv", "--synthetic", "--synthetic-size", "32",
        "--eval", "--votes", "2", "--batch_size", "4",
        "--num_points", "128", "--kp-buckets", "2",
        "--checkpoint-dir", str(tmp_path),
    ])
    m = re.search(r"eval OA \(2 votes\): ([0-9.]+)%", out)
    assert m, out
    assert 0.0 <= float(m.group(1)) <= 100.0
