#!/usr/bin/env python
"""Measure host-side batch feed rate (samples/s): per-item loop vs the
vectorized get_batch path vs the fork worker pool.

The device consumes ~2,500 samples/s on the headline workload
(B=64 N=1024 PointNet++, 25 ms step): the host pipeline must sustain
more than that or it becomes the bottleneck (VERDICT r2 #8). Items
carry the real ModelNet40 cost — a [10000, 6] cloud per item with
permutation + unit-sphere normalization + scale/translate augmentation
(the actual ModelNet40 class methods run, on synthetic raw clouds).

Run anywhere (pure numpy):  python scripts/bench_feed_rate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pointcloudlib_tpu.data.loader import cls_batches  # noqa: E402
from pointcloudlib_tpu.data.modelnet40 import ModelNet40  # noqa: E402


class _RealCostModelNet(ModelNet40):
    """The real ModelNet40 item/batch code on synthetic raw clouds."""

    def __init__(self, size=2048, n_points=1024, seed=0):
        self.n_points = n_points
        self.train = True
        self.augment = True
        self.permute = True
        self._rng = np.random.default_rng(seed + 1)
        rng = np.random.default_rng(seed)
        self._data = (
            rng.standard_normal((size, 10000, 6)).astype(np.float32),
            (np.arange(size) % 40).astype(np.int32),
        )


class _NoBatchPath:
    """Hide get_batch to force the legacy per-item loop."""

    def __init__(self, ds):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        return self._ds[i]


def measure(ds, workers: int, batch_size=64, epochs=2):
    for _ in cls_batches(ds, batch_size, shuffle=True, workers=workers):
        pass  # warm epoch: pool spin-up, page faults
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for b in cls_batches(ds, batch_size, shuffle=True,
                             workers=workers):
            n += b["xyz"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


if __name__ == "__main__":
    ds = _RealCostModelNet()
    print(f"per-item loop, workers=0: "
          f"{measure(_NoBatchPath(ds), 0):8.0f} samples/s", flush=True)
    print(f"vectorized,   workers=0: {measure(ds, 0):8.0f} samples/s",
          flush=True)
    for w in (2, 4):
        print(f"vectorized,   workers={w}: {measure(ds, w):8.0f} samples/s",
              flush=True)
