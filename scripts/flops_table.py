#!/usr/bin/env python
"""Derive the analytic FLOPs-per-sample table for bench.py's MFU field.

Method: build each bench workload's train step exactly as bench.py does,
lower + compile it on the CPU backend (forced XLA route — no Pallas
custom calls, whose FLOPs XLA cannot see), and read the HLO cost
analysis. That counts the FLOPs of the straightforward XLA formulation
of each algorithm (dense layers, distance matrices, gathers-as-loads) —
an implementation-independent yardstick: the Pallas/fused paths execute
a different (usually smaller) op stream, so achieved MFU measures how
much faster than the naive-XLA-op-count roofline the kernels run the
same algorithm.

Run on CPU (the numbers are backend-independent HLO counts):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/flops_table.py

Paste the printed dict into bench.py:FLOPS_PER_SAMPLE.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("POINTCLOUDLIB_KERNELS", "xla")
os.environ.setdefault("POINTCLOUDLIB_FUSED_SA", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402


def _cls_flops(model_name, batch_size, n_points, with_normals):
    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.train import (
        create_train_state,
        make_cls_train_step,
        sgd_momentum,
        step_decay,
    )

    model = get_cls_model(model_name, n_classes=40)
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((batch_size, n_points, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    batch = {
        "xyz": xyz,
        "label": (np.arange(batch_size) % 40).astype(np.int32),
    }
    if with_normals:
        batch["feats"] = rng.standard_normal(
            (batch_size, n_points, 3)).astype(np.float32)
    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(
        model, key, batch["xyz"][:1],
        batch["feats"][:1] if with_normals else None, tx,
    )
    step = make_cls_train_step(model)
    cost = step.lower(state, batch, key).compile().cost_analysis()
    return cost["flops"] / batch_size


def _seg_flops(model_name, with_feats, batch_size=16, n_points=2048):
    from pointcloudlib_tpu.models import get_seg_model
    from pointcloudlib_tpu.train import (
        make_seg_train_step,
        sgd_momentum,
        step_decay,
    )
    from pointcloudlib_tpu.train.state import TrainState, init_variables

    model = get_seg_model(model_name, part_num=50)
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((batch_size, n_points, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    batch = {
        "xyz": xyz,
        "cls_onehot": np.eye(16, dtype=np.float32)[
            np.arange(batch_size) % 16],
        "seg": (np.arange(batch_size * n_points) % 50).astype(
            np.int32).reshape(batch_size, n_points),
    }
    if with_feats:
        batch["feats"] = xyz
    key = jax.random.key(0)
    variables = init_variables(
        model, key, batch["xyz"][:1], batch["cls_onehot"][:1],
        feats=batch["feats"][:1] if with_feats else None,
    )
    tx = sgd_momentum(step_decay(0.01), momentum=0.9)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), tx=tx,
    )
    step = make_seg_train_step(model)
    cost = step.lower(state, batch, key).compile().cost_analysis()
    return cost["flops"] / batch_size


def main():
    jobs = [
        ("pointnet_modelnet40_train_throughput",
         lambda: _cls_flops("pointnet", 64, 1024, False)),
        ("pointnet2_ssg_n4096_normals_train_throughput",
         lambda: _cls_flops("pointnet2", 32, 4096, True)),
        ("pointnet2_msg_modelnet40_train_throughput",
         lambda: _cls_flops("pointnet2_msg", 32, 1024, True)),
        ("dgcnn_modelnet40_train_throughput",
         lambda: _cls_flops("dgcnn", 32, 1024, False)),
        ("pointcnn_modelnet40_train_throughput",
         lambda: _cls_flops("pointcnn", 32, 1024, False)),
        ("pointconv_modelnet40_train_throughput",
         lambda: _cls_flops("pointconv", 32, 1024, True)),
        ("kpconv_modelnet40_train_throughput",
         lambda: _cls_flops("kpconv", 16, 1024, False)),
        ("pointnet2_shapenet_partseg_train_throughput",
         lambda: _seg_flops("pointnet2", True)),
        ("dgcnn_shapenet_partseg_train_throughput",
         lambda: _seg_flops("dgcnn", False)),
        ("pointcnn_shapenet_partseg_train_throughput",
         lambda: _seg_flops("pointcnn", True)),
        ("pointconv_shapenet_partseg_train_throughput",
         lambda: _seg_flops("pointconv", False)),
        ("pointnet2_ssg_modelnet40_train_throughput",
         lambda: _cls_flops("pointnet2", 64, 1024, True)),
    ]
    print("FLOPS_PER_SAMPLE = {  # GFLOP/sample, scripts/flops_table.py")
    for metric, fn in jobs:
        try:
            g = fn() / 1e9
            print(f'    "{metric}": {g:.2f},')
        except Exception as e:
            print(f'    # "{metric}": failed: {e}')
    print("}")


if __name__ == "__main__":
    main()
