#!/usr/bin/env python
"""Quickstart: the library API end to end on synthetic data.

Runs anywhere (CPU or TPU):
    python examples/quickstart.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu import ops
from pointcloudlib_tpu.data import SyntheticModelNet, cls_batches
from pointcloudlib_tpu.models import get_cls_model
from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
from pointcloudlib_tpu.train import (
    create_train_state,
    make_cls_train_step,
    sgd_momentum,
    step_decay,
)


def demo_ops():
    """The neighbor-op toolbox on raw arrays."""
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((4, 512, 3)), jnp.float32)

    idx = ops.fps(xyz, 128)                       # farthest-point sampling
    centers = ops.index_points(xyz, idx)          # gather
    nidx, cnt = ops.ball_query(centers, xyz, 0.3, 32)
    grouped = ops.group_points(xyz, None, centers, nidx)   # local coords
    d2, knn_idx = ops.knn(centers, xyz, 16)
    print("fps:", idx.shape, "ball query:", nidx.shape,
          "grouped:", grouped.shape, "knn:", knn_idx.shape)


def demo_training(steps: int = 5):
    """A few real train steps: model, mesh, sharded batches."""
    mesh = make_mesh()                       # all local devices, 1-D DP
    ds = SyntheticModelNet(n_points=128, size=256, train=True)
    batches = cls_batches(ds, batch_size=4 * mesh.devices.size,
                          shuffle=True, drop_last=True)

    model = get_cls_model("pointnet2", n_classes=40)
    batch = next(batches)
    tx = sgd_momentum(step_decay(0.05), momentum=0.9)
    state = create_train_state(
        model, jax.random.key(0), batch["xyz"], batch["feats"], tx
    )
    state = replicate(mesh, state)
    step = make_cls_train_step(model, mesh)

    rng = jax.random.key(1)
    for i, batch in enumerate(batches):
        if i >= steps:
            break
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, shard_batch(mesh, batch), sub)
        print(f"step {i}: loss={float(metrics['loss']):.3f}")
    return state


if __name__ == "__main__":
    print("devices:", jax.devices())
    demo_ops()
    demo_training()
