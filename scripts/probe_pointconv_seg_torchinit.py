#!/usr/bin/env python
"""Torch-style-init arm of the pointconv-seg convergence probe.

Gradient parity holds at imported weights
(probe_pointconv_seg_gradparity.py: loss equal, per-module |g| ratios
<= 1.02), so the remaining arm-differences vs the fast-converging torch
mirror are (a) the init DISTRIBUTION and (b) bf16 TPU matmuls. This arm
tests (a): patch flax Dense's default kernel init from lecun_normal
(std 1/sqrt(fan_in)) to torch Conv/Linear's kaiming_uniform(a=sqrt(5))
(std 1/sqrt(3*fan_in)) and train with the same no-dropout budget.

Mechanism under test: every Dense here feeds a BatchNorm, and under BN
the effective learning rate on a weight's direction scales as
lr/||w||^2 — lecun_normal's ||w||^2 is 3x kaiming_uniform's, i.e. a
~3x effective-lr deficit on every BN'd layer.

Arm (b) is plain `POINTCLOUDLIB_DTYPE=float32
python scripts/probe_pointconv_seg_nodropout.py`.

Usage: python scripts/probe_pointconv_seg_torchinit.py --epochs 10
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PATCH = """
import flax.linen as _fnn
import jax.nn.initializers as _init

class _NoDropout(_fnn.Module):
    rate: float = 0.0
    deterministic: bool = None  # accepted, ignored

    @_fnn.compact
    def __call__(self, x, deterministic=None):
        return x

_fnn.Dropout = _NoDropout

_Dense = _fnn.Dense
_torch_kernel = _init.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

def _TorchInitDense(*args, **kw):
    kw.setdefault("kernel_init", _torch_kernel)
    return _Dense(*args, **kw)

_fnn.Dense = _TorchInitDense

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
