#!/usr/bin/env python
"""Dropout-ablation arm of the pointconv-seg convergence probe.

probe_pointconv_seg_convergence.py trains the reference-keyed TORCH
mirror (which omits the reference's head dropout 0.4 —
networks/seg/pointconv_partseg.py:36 drop1) and converges ~5x faster
in early epochs than our CLI arm (which faithfully keeps dropout).
This arm removes the confound: train OUR JAX model with nn.Dropout
patched to identity, same budget/optimizer/data as both other arms.
Matching the torch mirror's curve here = the gap is the dropout (our
training path is sound, the mirror was the unfaithful arm).

Usage: python scripts/probe_pointconv_seg_nodropout.py --epochs 10
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PATCH = """
import flax.linen as _fnn

class _NoDropout(_fnn.Module):
    rate: float = 0.0
    deterministic: bool = None  # accepted, ignored

    @_fnn.compact
    def __call__(self, x, deterministic=None):
        return x

_fnn.Dropout = _NoDropout

import runpy, sys
sys.argv = ["train_partseg.py", "--model", "pointconv", "--synthetic",
            "--synthetic-size", "256", "--epochs", EPOCHS,
            "--batch_size", "16", "--num_points", "1024"]
runpy.run_path("train_partseg.py", run_name="__main__")
"""

if __name__ == "__main__":
    epochs = "10"
    if len(sys.argv) > 2 and sys.argv[1] == "--epochs":
        epochs = sys.argv[2]
    code = PATCH.replace("EPOCHS", repr(epochs))
    raise SystemExit(subprocess.run(
        [sys.executable, "-c", code], cwd=ROOT).returncode)
