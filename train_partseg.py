#!/usr/bin/env python
"""ShapeNet part-segmentation training CLI.

Same UX as the reference train_partseg.py:222-237 (``--model
{pointnet,pointnet2,pointcnn,dgcnn,pointconv}``) plus ``--synthetic`` /
``--n-devices`` / step caps for smoke runs. Metrics: per-point accuracy
and mean shape IoU (reference calculate_shape_IoU semantics,
train_partseg.py:28-63).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Part segmentation (TPU)")
    p.add_argument("--model", default="pointnet2")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint and continue")
    p.add_argument("--data-root", default="data/shapenet_part_seg_hdf5_data")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--class-choice", default=None,
                   help="restrict to one category (reference shapenet_loader.py:68-75)")
    p.add_argument("--synthetic-size", type=int, default=256)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--dp", default="auto",
                   choices=["auto", "spmd", "shard_map"],
                   help="multi-device DP mode. shard_map runs the step "
                        "per shard with explicit sync-BN/grad psums — "
                        "REQUIRED for the Pallas models on real "
                        "multi-chip meshes (jit-SPMD has no partitioner "
                        "for custom calls). auto = shard_map whenever "
                        "the mesh has >1 device")
    p.add_argument("--debug", action="store_true",
                   help="NaN faulting (jax_debug_nans) + checkify "
                        "OOB/NaN checks on the first eval batch "
                        "(utils/debug.py)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host DCN) "
                        "from the standard env before building the mesh")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=0,
                   help="fork-based batch-assembly workers (reference "
                        "num_workers analogue); 0 = prefetch thread "
                        "only. Only pays on multi-core hosts")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--log-dir", default=None,
                   help="write JSONL metrics here")
    return p.parse_args(argv)


def _prep(batch, model_name):
    """Attach the 16-way one-hot; pointnet2 also gets xyz as features
    (reference passes ``model(data, data, one_hot)``,
    train_partseg.py:111)."""
    out = {
        "xyz": batch["xyz"],
        "seg": batch["seg"],
        "cls_onehot": np.eye(16, dtype=np.float32)[batch["label"]],
    }
    if "valid" in batch:
        out["valid"] = batch["valid"]
    if model_name.startswith("pointnet2"):
        out["feats"] = batch["xyz"]
    return out


def main(argv=None):
    args = parse_args(argv)
    import optax

    from pointcloudlib_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # remote compiles are the session tax
    from pointcloudlib_tpu.data import prefetch, seg_batches
    from pointcloudlib_tpu.data.shapenet import make_shapenet
    from pointcloudlib_tpu.models import get_seg_model
    from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
    from pointcloudlib_tpu.train import (
        create_train_state,
        reference_flat_lr,
        sgd_momentum,
    )
    from pointcloudlib_tpu.train.metrics import shape_ious
    from pointcloudlib_tpu.train.trainer import (
        make_seg_eval_step,
        make_seg_train_step,
    )
    from pointcloudlib_tpu.utils.checkpoint import CheckpointManager

    if args.debug:
        from pointcloudlib_tpu.utils import debug as dbg

        dbg.enable()
    if args.multihost:
        from pointcloudlib_tpu.parallel import initialize_multihost

        active = initialize_multihost()
        print(f"multihost: {'active' if active else 'single-process'} "
              f"({jax.process_count()} processes)")

    mesh = make_mesh(args.n_devices)
    n_dev = mesh.devices.size
    if args.batch_size % n_dev:
        raise SystemExit(
            f"batch_size {args.batch_size} not divisible by mesh size {n_dev}"
        )
    # DP mode (see train_cls.py): shard_map is the only mode that
    # partitions Pallas custom calls on real multi-chip meshes
    dp = args.dp
    if dp == "auto":
        dp = "shard_map" if n_dev > 1 else "spmd"
    axis_name = "data" if (dp == "shard_map" and n_dev > 1) else None
    print(f"devices: {n_dev} × {jax.devices()[0].device_kind}, "
          f"model={args.model}, N={args.num_points}, B={args.batch_size}"
          + (f", dp={dp}" if n_dev > 1 else ""))

    train_ds = make_shapenet(
        "trainval", args.num_points, data_root=args.data_root,
        synthetic=args.synthetic, synthetic_size=args.synthetic_size,
        seed=args.seed, class_choice=args.class_choice,
    )
    test_ds = make_shapenet(
        "test", args.num_points, data_root=args.data_root,
        synthetic=args.synthetic,
        synthetic_size=max(64, args.synthetic_size // 4), seed=args.seed,
        class_choice=args.class_choice,
    )

    from pointcloudlib_tpu.models import SEG_MODELS, dp_kwargs

    model_kw = (dict(dp_kwargs(SEG_MODELS[args.model], axis_name, n_dev))
                if args.model in SEG_MODELS else {})
    model = get_seg_model(args.model, part_num=50, **model_kw)
    rng = jax.random.key(args.seed)
    sample = _prep(
        next(seg_batches(train_ds, args.batch_size)), args.model
    )

    def init_state():
        from pointcloudlib_tpu.train.state import init_variables

        variables = init_variables(
            model, rng, sample["xyz"], sample["cls_onehot"],
            feats=sample.get("feats"),
        )
        if args.optimizer == "sgd":
            # constant lr (see reference_flat_lr) + the reference's
            # weight_decay=1e-4 (train_partseg.py:76)
            # the ShapeNetPart loader drops the last partial batch
            # (shapenet_loader.py:86) — floor batch count
            lr = reference_flat_lr(
                args.lr, len(train_ds), args.batch_size, drop_last=True
            )
            tx = sgd_momentum(lr, momentum=args.momentum,
                              weight_decay=1e-4)
        else:
            tx = optax.adam(args.lr)
        from pointcloudlib_tpu.train.state import TrainState

        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=tx,
        )

    state = replicate(mesh, init_state())
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {n_params/1e6:.2f}M")

    train_step = make_seg_train_step(model, mesh, axis_name=axis_name)
    eval_step = make_seg_eval_step(model, mesh, axis_name=axis_name)
    ckpt = CheckpointManager(Path(args.checkpoint_dir) / f"{args.model}_partseg")
    from pointcloudlib_tpu.utils.logging import MetricsLogger

    mlog = MetricsLogger(args.log_dir, run_name=f"partseg_{args.model}")

    def evaluate(state):
        from pointcloudlib_tpu.train.metrics import balanced_accuracy

        correct = total = 0
        ious, trues, preds = [], [], []
        needs_check = args.debug
        for batch in seg_batches(test_ds, args.batch_size, drop_last=False):
            prepped = _prep(batch, args.model)
            if needs_check:
                from pointcloudlib_tpu.utils.debug import checked

                checked(
                    lambda v, x, oh, f: model.apply(
                        v, x, oh, feats=f, training=False)
                )(state.variables(), prepped["xyz"], prepped["cls_onehot"],
                  prepped.get("feats"))
                needs_check = False
            pred = np.asarray(eval_step(state, shard_batch(mesh, prepped)))
            valid = batch["valid"]
            correct += ((pred == batch["seg"]) & valid[:, None]).sum()
            total += valid.sum() * pred.shape[1]
            ious.append(shape_ious(pred[valid], batch["seg"][valid],
                                   batch["label"][valid]))
            trues.append(batch["seg"][valid].reshape(-1))
            preds.append(pred[valid].reshape(-1))
        bal = 100.0 * balanced_accuracy(
            np.concatenate(trues), np.concatenate(preds), 50
        )
        return (100.0 * correct / max(total, 1),
                100.0 * float(np.mean(np.concatenate(ious))),
                bal)

    if args.eval:
        state = ckpt.restore(state) or state
        acc, iou, bal = evaluate(state)
        print(f"eval acc: {acc:.2f}%  balanced: {bal:.2f}%  "
              f"mean shape IoU: {iou:.2f}%")
        return

    best_iou, pending, start_epoch = 0.0, None, 0
    if args.resume:
        restored = ckpt.restore_with_step(state)
        if restored is not None:
            state, start_epoch = restored
            start_epoch += 1
            best_iou = ckpt.best_metric() or 0.0
            print(f"resumed from epoch {start_epoch - 1} "
                  f"(best IoU so far {best_iou:.2f}%)")
    for epoch in range(start_epoch, args.epochs):
        t0, seen = time.perf_counter(), 0
        for i, batch in enumerate(prefetch(
            seg_batches(train_ds, args.batch_size, shuffle=True,
                        seed=args.seed + epoch, drop_last=True,
                        workers=args.num_workers)
        )):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            prepped = shard_batch(mesh, _prep(batch, args.model))
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, prepped, sub)
            pending = metrics
            seen += args.batch_size
            if (i + 1) % args.log_every == 0:
                m = jax.device_get(pending)
                print(f"epoch {epoch} step {i+1}: "
                      f"loss={float(m['loss']):.4f} "
                      f"acc={float(m['acc'])*100:.2f}%")
        # value-fetch fence before timing (block_until_ready can
        # return at enqueue time on the tunneled axon platform)
        m = (jax.device_get(pending) if pending is not None
             else {"loss": float("nan")})
        dt = time.perf_counter() - t0
        acc, iou, bal = evaluate(state)
        print(f"epoch {epoch}: loss={float(m['loss']):.4f} "
              f"test acc={acc:.2f}% bal={bal:.2f}% IoU={iou:.2f}% "
              f"({seen/dt:.1f} samples/s)")
        mlog.log("epoch", epoch=epoch, loss=float(m["loss"]), test_acc=acc,
                 test_balanced_acc=bal, test_iou=iou,
                 samples_per_sec=seen / dt)
        ckpt.save(state, step=epoch, best=iou > best_iou, metric=iou)
        best_iou = max(best_iou, iou)
    print(f"best IoU: {best_iou:.2f}%")


if __name__ == "__main__":
    main()
