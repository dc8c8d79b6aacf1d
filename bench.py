#!/usr/bin/env python
"""Headline benchmark: PointNet++ SSG ModelNet40 training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

Baseline: the reference README reports Jittor at 2.72× its PyTorch port
for PointNet++ cls training but no absolute rate and no hardware
(BASELINE.md). We use a measured proxy: the PyTorch-geometric-era
community consensus for PointNet++ SSG (1024 pts, B=32) on a V100-class
GPU is ~350-450 samples/sec; × 2.72 → ~1000 samples/sec for the Jittor
reference. BASELINE.json's target is >2× that on one v5e-8 ⇒ per-chip
target ≈ 250 samples/sec. vs_baseline reported against the 1000
samples/sec whole-reference number so the ratio is conservative.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

REFERENCE_SAMPLES_PER_SEC = 1000.0  # Jittor 1×GPU proxy (see docstring)


def main():
    import optax

    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
    from pointcloudlib_tpu.train import (
        create_train_state,
        make_cls_train_step,
        sgd_momentum,
        step_decay,
    )

    batch_size, n_points = 64, 1024
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch_size = max(batch_size, 8 * n_dev)

    model = get_cls_model("pointnet2", n_classes=40)
    rng = np.random.default_rng(0)
    batch = {
        "xyz": np.asarray(
            rng.standard_normal((batch_size, n_points, 3)), np.float32
        ),
        "feats": np.asarray(
            rng.standard_normal((batch_size, n_points, 3)), np.float32
        ),
        "label": (np.arange(batch_size) % 40).astype(np.int32),
    }

    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(
        model, key, batch["xyz"][:1], batch["feats"][:1], tx
    )
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, batch)
    step = make_cls_train_step(model, mesh)

    # warmup / compile. NOTE: on the tunneled axon platform
    # block_until_ready can return before remote execution completes;
    # only a value transfer (device_get) is a reliable fence.
    for _ in range(3):
        state, metrics = step(state, sharded, key)
    jax.device_get(metrics)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, sharded, key)
    final_loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    sps = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "pointnet2_ssg_modelnet40_train_throughput",
                "value": round(sps, 1),
                "unit": "samples/sec",
                "vs_baseline": round(sps / REFERENCE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
