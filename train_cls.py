#!/usr/bin/env python
"""ModelNet40 classification training CLI.

Same UX as the reference train_cls.py:367-383 (``--model
{pointnet,pointnet2,pointnet2_msg,pointcnn,dgcnn,pointconv,kpconv}
[--eval]``) plus TPU-native flags: ``--synthetic`` (procedural data,
zero-egress envs), ``--n-devices`` (DP mesh width), ``--votes``,
``--log-dir`` (compute dtype via POINTCLOUDLIB_DTYPE env).

TPU-first differences from the reference loop:
  * one jit-ed, donated train step; metrics fetched off-device once per
    log interval instead of the per-step ``.data`` syncs
    (train_cls.py:73-75);
  * batch axis sharded over the ICI mesh, params replicated, gradient
    psum inserted by XLA;
  * orbax checkpoints every epoch (best + latest) for every model, not
    just KPConv (reference train_cls.py:453-470).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Point cloud classification (TPU)")
    p.add_argument("--model", default="pointnet2",
                   help="pointnet | pointnet2 | pointnet2_msg | dgcnn | "
                        "pointcnn | pointconv | kpconv")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint and continue")
    p.add_argument("--confusion", action="store_true",
                   help="print per-class accuracy at eval (fast_confusion, "
                        "reference train_cls.py:143-227)")
    p.add_argument("--votes", type=int, default=1,
                   help="voting eval: average softmax over N re-augmented "
                        "passes (reference classification_test, "
                        "train_cls.py:230-328)")
    p.add_argument("--data-root", default="data/modelnet40_normal_resampled")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the procedural synthetic dataset")
    p.add_argument("--synthetic-size", type=int, default=512)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="cap steps per epoch (smoke tests)")
    p.add_argument("--deform-lr-factor", type=float, default=0.0,
                   help="lr multiplier on kpconv_deform offset params. "
                        "Default 0.0 = frozen offsets, matching the "
                        "reference (train_cls.py:406 drops 'offset' "
                        "params from SGD). 0.1 is the original KPConv "
                        "paper recipe (datasets/ModelNet40.py:1084) — "
                        "measured unstable on the synthetic ladder "
                        "(offsets run away, reg loss grows 7->32 in "
                        "120 steps)")
    p.add_argument("--kp-buckets", type=int, default=2,
                   help="KPConv occupancy buckets: calibrate pyramid "
                        "shapes per occupancy class and compile one "
                        "program each — the static-shape equivalent of "
                        "the reference's point-budget batching "
                        "(kpconv_loader.py:704); 1 = single shape")
    p.add_argument("--kp-cap-quantile", type=float, default=0.9,
                   help="KPConv voxel-cap calibration quantile: each "
                        "layer's static point budget covers this "
                        "fraction of observed occupancies; denser "
                        "clouds truncate (counted and surfaced — the "
                        "reference's max_p cap also truncates, "
                        "kpconv_loader.py:704). Truncation-free maxima "
                        "(pre-r5 behavior) with -1; measured 2x slower "
                        "at equal data (docs/DESIGN.md r4 ledger)")
    p.add_argument("--n-devices", type=int, default=None,
                   help="devices in the data mesh (default: all)")
    p.add_argument("--dp", default="auto",
                   choices=["auto", "spmd", "shard_map"],
                   help="multi-device DP mode. shard_map runs the step "
                        "per shard with explicit sync-BN/grad psums — "
                        "REQUIRED for the Pallas models on real "
                        "multi-chip meshes (jit-SPMD has no partitioner "
                        "for custom calls and would replicate them). "
                        "auto = shard_map whenever the mesh has >1 "
                        "device")
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
                   help="fork-based batch-assembly workers (the "
                        "reference's dataloader num_workers=4, "
                        "kpconv_loader.py:199-201); 0 = assemble in "
                        "the prefetch thread. Only pays on multi-core "
                        "hosts — scripts/bench_feed_rate.py measures")
    p.add_argument("--diff-checkpoint", default=None, metavar="CK.pt",
                   help="audit a migrated torch checkpoint: import it "
                        "through utils.interop, run one eval batch with "
                        "every module's activation captured, then diff "
                        "against --diff-trace / dump via --dump-trace "
                        "and exit (reference train_cls.py:330-361 hook)")
    p.add_argument("--diff-trace", default=None, metavar="NPZ",
                   help="torch-side activation trace to diff against "
                        "(record it with scripts/dump_torch_activations.py)")
    p.add_argument("--dump-trace", default=None, metavar="NPZ",
                   help="write OUR activation stream for the torch side")
    p.add_argument("--diff-atol", type=float, default=1e-2,
                   help="per-module mismatch tolerance for "
                        "--diff-trace. Default 1e-2: on TPU our Dense "
                        "layers matmul in bf16 (f32 accumulate), so a "
                        "correct migration still differs from f32 "
                        "torch by ~5e-3 relative; use 1e-4 when both "
                        "sides run f32 (CPU)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--log-dir", default=None,
                   help="write JSONL metrics here")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import optax

    from pointcloudlib_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # remote compiles are the session tax
    from pointcloudlib_tpu.data import cls_batches, make_modelnet40, prefetch
    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
    from pointcloudlib_tpu.train import (
        create_train_state,
        make_cls_eval_step,
        make_cls_train_step,
        reference_flat_lr,
        sgd_momentum,
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
    # DP mode: >1 device defaults to shard_map — the only mode whose
    # step partitions the Pallas custom calls on real multi-chip
    # hardware; the model is built with axis_name so every BatchNorm
    # syncs (sync-BN = jit-SPMD's implicit semantics, made explicit)
    dp = args.dp
    if dp == "auto":
        dp = "shard_map" if n_dev > 1 else "spmd"
    axis_name = "data" if (dp == "shard_map" and n_dev > 1) else None
    print(f"devices: {n_dev} × {jax.devices()[0].device_kind}, "
          f"model={args.model}, N={args.num_points}, B={args.batch_size}"
          + (f", dp={dp}" if n_dev > 1 else ""))

    # only PointNet++ consumes normals as features (reference
    # train_cls.py:63-69 passes bare pts to every other model)
    with_normals = args.model.startswith("pointnet2")
    is_kpconv = args.model.startswith("kpconv")
    train_ds = make_modelnet40(
        args.num_points, train=True, data_root=args.data_root,
        synthetic=args.synthetic, synthetic_size=args.synthetic_size,
        seed=args.seed,
        # KPConv replaces the ModelNet scale/translate augment with its
        # own augmentation_transform (kpconv_augment), applied by the
        # epoch iterator below; keep the per-epoch point permutation
        augment=False if is_kpconv else None,
        permute=True if is_kpconv else None,
    )
    test_ds = make_modelnet40(
        args.num_points, train=False, data_root=args.data_root,
        synthetic=args.synthetic,
        synthetic_size=max(64, args.synthetic_size // 4),
        seed=args.seed,
    )

    if args.diff_checkpoint:
        # activation audit of a migrated checkpoint, then exit (the
        # reference's hook() mode). KPConv takes pyramid inputs, not
        # (xyz, feats) — its importer is covered by the static parity
        # tests instead (tests/test_reference_import_kpconv.py).
        if is_kpconv:
            raise SystemExit("--diff-checkpoint supports the (xyz, "
                             "feats) families; for kpconv use "
                             "utils.interop.kpcnn_from_reference + "
                             "utils.actdiff directly")
        from pointcloudlib_tpu.utils import actdiff

        items = [test_ds[i] for i in range(min(len(test_ds),
                                               args.batch_size))]
        xyz = np.stack([it[0] for it in items]).astype(np.float32)
        feats = (np.stack([it[1] for it in items]).astype(np.float32)
                 if with_normals else None)
        actdiff.diff_checkpoint(
            args.model, "cls", args.diff_checkpoint, xyz, feats,
            trace=args.diff_trace, dump=args.dump_trace,
            n_classes=40, atol=args.diff_atol)
        return

    from pointcloudlib_tpu.models import CLS_MODELS, dp_kwargs

    model_kw = (dict(dp_kwargs(CLS_MODELS[args.model], axis_name, n_dev))
                if args.model in CLS_MODELS else {})
    kp_sampler = kp_rng = kp_bcal = None
    if is_kpconv:
        # reference KPConv pipeline: potential-based epoch sampling +
        # per-cloud augmentation (kpconv_loader.py:709-794, 415-491) and
        # pyramid shapes calibrated from data instead of the frozen
        # constants the reference ships (kpconv_loader.py:696-706)
        from pointcloudlib_tpu.data import PotentialSampler, kpconv_augment
        from pointcloudlib_tpu.models.kpconv.adapter import KPConvCls
        from pointcloudlib_tpu.models.kpconv.calibrate import (
            calibrate_pyramid,
        )
        from pointcloudlib_tpu.models.kpconv.model import KPConvConfig

        base = KPConvConfig()
        arch = base.architecture
        if args.model == "kpconv_deform":
            arch = tuple(
                b.replace("resnetb", "resnetb_deformable")
                if i >= 9 and b.startswith("resnetb") else b
                for i, b in enumerate(arch)
            )
        kp_rng = np.random.default_rng(args.seed + 1)
        n_cal = min(len(train_ds), 64)
        # calibrate on *augmented* clouds so the occupancy/neighbor
        # distributions match what training will see
        cal_clouds = np.stack([
            kpconv_augment(train_ds[i][0], kp_rng) for i in range(n_cal)
        ])
        if args.kp_buckets > 1:
            from pointcloudlib_tpu.models.kpconv.calibrate import (
                calibrate_buckets,
            )

            kp_bcal = calibrate_buckets(
                cal_clouds, KPConvCls.first_subsampling_dl,
                base.conv_radius, base.deform_radius, arch,
                n_buckets=args.kp_buckets,
                cap_quantile=(None if args.kp_cap_quantile < 0
                              else args.kp_cap_quantile),
                margin=1.0 if args.kp_cap_quantile >= 0 else 1.15,
            )
            # init/eval shapes: element-wise max across buckets —
            # buckets[-1]'s neighborhood_limits are measured only on
            # top-occupancy clouds and can truncate the (denser)
            # low-occupancy ones at eval
            calib = kp_bcal.merged()
            print(f"kpconv calibration ({n_cal} clouds, "
                  f"{args.kp_buckets} buckets): {kp_bcal.describe()}")
        else:
            kp_bcal = None
            calib = calibrate_pyramid(
                cal_clouds, KPConvCls.first_subsampling_dl,
                base.conv_radius, base.deform_radius, arch,
                cap_quantile=(None if args.kp_cap_quantile < 0
                              else args.kp_cap_quantile),
                margin=1.0 if args.kp_cap_quantile >= 0 else 1.15,
            )
            print(f"kpconv calibration ({n_cal} clouds): "
                  f"{calib.describe()}")
        model_kw.update(
            caps=calib.caps,
            neighborhood_limits=calib.neighborhood_limits,
        )
        kp_sampler = PotentialSampler(len(train_ds), seed=args.seed)

    model = get_cls_model(args.model, n_classes=40, **model_kw)
    rng = jax.random.key(args.seed)
    sample = next(cls_batches(train_ds, args.batch_size,
                              with_normals=with_normals))
    if is_kpconv and args.optimizer == "sgd":
        # the reference KPConv recipe (datasets/ModelNet40.py:1392-1402):
        # lr 1e-2, momentum 0.98, 0.1^(1/100) decay per epoch, clip 100
        steps_per_epoch = args.steps_per_epoch or max(
            1, len(train_ds) // args.batch_size
        )
        sched = optax.exponential_decay(
            1e-2, transition_steps=steps_per_epoch,
            decay_rate=0.1 ** (1 / 100), staircase=True,
        )
        tx = optax.chain(
            optax.clip_by_global_norm(100.0),
            optax.sgd(sched, momentum=0.98),
        )
        if args.model == "kpconv_deform":
            # Offset-param treatment. The reference drops 'offset'
            # params from SGD entirely (train_cls.py:406) — frozen
            # offsets — our default (factor 0.0). The original KPConv
            # recipe trains them at deform_lr_factor=0.1
            # (datasets/ModelNet40.py:1084); available via
            # --deform-lr-factor 0.1, but measured unstable here.
            def _offset_mask(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: any(
                        "offset" in str(getattr(k, "key", k)) for k in path
                    ),
                    params,
                )

            tx = optax.chain(
                tx,
                optax.masked(
                    optax.scale(args.deform_lr_factor), _offset_mask
                ),
            )
    elif args.optimizer == "sgd":
        # the reference's effective schedule is a constant lr — see
        # reference_flat_lr (train/schedules.py) for the full story
        lr = reference_flat_lr(args.lr, len(train_ds), args.batch_size)
        tx = sgd_momentum(lr, momentum=args.momentum)
    else:
        tx = optax.adam(args.lr)
    state = create_train_state(
        model, rng, sample["xyz"], sample.get("feats"), tx
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {n_params/1e6:.2f}M")
    state = replicate(mesh, state)

    train_step = make_cls_train_step(model, mesh, axis_name=axis_name)
    eval_step = make_cls_eval_step(model, mesh, axis_name=axis_name)
    bucket_steps = None
    if kp_bcal is not None:
        # one compiled program per occupancy bucket; parameters are
        # shape-independent, so every bucket shares the same state
        bucket_models = [
            get_cls_model(args.model, n_classes=40, **dict(
                model_kw, caps=c.caps,
                neighborhood_limits=c.neighborhood_limits))
            for c in kp_bcal.buckets
        ]
        bucket_steps = [make_cls_train_step(m, mesh, axis_name=axis_name)
                        for m in bucket_models]
    ckpt = CheckpointManager(Path(args.checkpoint_dir) / args.model)
    from pointcloudlib_tpu.utils.logging import MetricsLogger

    mlog = MetricsLogger(args.log_dir, run_name=f"cls_{args.model}")

    def evaluate(state, confusion=False):
        correct = total = 0
        trues, preds = [], []
        pred_step = None
        needs_check = args.debug
        if confusion:
            from pointcloudlib_tpu.train import make_cls_pred_step

            # ONE forward per batch: predictions come back and
            # correct/total derive from them on host (the plain path
            # keeps the cheaper count-only eval_step)
            pred_step = make_cls_pred_step(model, mesh,
                                           axis_name=axis_name)
        for batch in cls_batches(test_ds, args.batch_size,
                                 with_normals=with_normals):
            sb = shard_batch(mesh, batch)
            if needs_check:
                # --debug: run one batch through checkify (index OOB +
                # NaN assertions materialize as exceptions here)
                from pointcloudlib_tpu.utils.debug import checked

                checked(
                    lambda v, x, f: model.apply(v, x, f, training=False)
                )(state.variables(), batch["xyz"], batch.get("feats"))
                if is_kpconv:
                    # voxel-cap audit: the sown truncation count must be
                    # zero or the calibrated caps are clipping real
                    # voxels (silent accuracy drift otherwise)
                    from pointcloudlib_tpu.models.kpconv.model import (
                        sum_overflow,
                    )

                    _, mut = model.apply(
                        state.variables(), batch["xyz"], None,
                        training=False, mutable=["intermediates"],
                    )
                    ov = sum_overflow(mut.get("intermediates", {}))
                    if ov is not None and float(jax.device_get(ov)) > 0:
                        raise RuntimeError(
                            f"pyramid caps truncated {int(ov)} voxels "
                            "on the first eval batch — re-calibrate "
                            "(--kp-buckets or larger caps)"
                        )
                needs_check = False
            if confusion:
                pred = np.asarray(pred_step(state, sb))
                valid = batch["valid"]
                correct += int(((pred == batch["label"]) & valid).sum())
                total += int(valid.sum())
                trues.append(batch["label"][valid])
                preds.append(pred[valid])
            else:
                c, t = eval_step(state, sb)
                correct += int(c); total += int(t)
        if confusion and trues:
            from pointcloudlib_tpu.train.metrics import fast_confusion

            cm = fast_confusion(np.concatenate(trues),
                                np.concatenate(preds), 40)
            per_class = np.diag(cm) / np.maximum(cm.sum(1), 1)
            for c_id in np.nonzero(cm.sum(1))[0]:
                print(f"  class {c_id:2d}: acc {per_class[c_id]*100:5.1f}% "
                      f"({cm[c_id].sum()} samples)")
        return 100.0 * correct / max(total, 1)

    def evaluate_voting(state, n_votes):
        """Average softmax over re-augmented passes (reference
        classification_test: incremental per-model prob average,
        train_cls.py:309-313)."""
        from pointcloudlib_tpu.train import make_cls_pred_step

        prob_step = make_cls_pred_step(model, mesh, axis_name=axis_name,
                                       probs=True)
        vote_ds = make_modelnet40(
            args.num_points, train=False, data_root=args.data_root,
            synthetic=args.synthetic,
            synthetic_size=max(64, args.synthetic_size // 4),
            seed=args.seed, augment=True,
        )
        probs, labels, valids = None, [], []
        for v in range(n_votes):
            pv, first = [], probs is None
            for batch in cls_batches(vote_ds, args.batch_size,
                                     with_normals=with_normals):
                pv.append(np.asarray(prob_step(state, shard_batch(mesh, batch))))
                if first:
                    labels.append(batch["label"])
                    valids.append(batch["valid"])
            pv = np.concatenate(pv)
            probs = pv if first else probs + (pv - probs) / (v + 1)
        labels = np.concatenate(labels)
        valid = np.concatenate(valids)
        pred = probs.argmax(-1)
        return 100.0 * ((pred == labels) & valid).sum() / valid.sum()

    def evaluate_voting_kpconv(state, n_votes):
        """KPConv voting test: each pass re-samples the test set with
        fresh potentials and re-augments with kpconv_augment, probs
        accumulated per item as an incremental average — the reference
        classification_test loop (train_cls.py:252-313, potentials
        refreshed at :263, averaging at :309-313)."""
        from pointcloudlib_tpu.data import PotentialSampler, kpconv_augment
        from pointcloudlib_tpu.train import make_cls_pred_step

        prob_step = make_cls_pred_step(model, mesh, axis_name=axis_name,
                                       probs=True)
        vote_ds = make_modelnet40(
            args.num_points, train=False, data_root=args.data_root,
            synthetic=args.synthetic,
            synthetic_size=max(64, args.synthetic_size // 4),
            seed=args.seed, augment=False, permute=True,
        )
        n = len(vote_ds)
        labels = np.array([vote_ds[i][2] for i in range(n)], np.int32)
        sampler = PotentialSampler(n, seed=args.seed + 7)
        rng = np.random.default_rng(args.seed + 8)
        probs = np.zeros((n, 40), np.float32)
        counts = np.zeros((n,), np.int32)
        for _v in range(n_votes):
            order = sampler.sample(n)  # fresh potentials per vote
            for start in range(0, n, args.batch_size):
                chunk = order[start : start + args.batch_size]
                clouds = [
                    kpconv_augment(vote_ds[int(i)][0], rng) for i in chunk
                ]
                while len(clouds) < args.batch_size:
                    clouds.append(clouds[-1])
                batch = {
                    "xyz": np.stack(clouds).astype(np.float32),
                    "label": np.zeros(args.batch_size, np.int32),
                    "valid": np.ones(args.batch_size, bool),
                }
                p = np.asarray(
                    prob_step(state, shard_batch(mesh, batch))
                )[: len(chunk)]
                probs[chunk] += (p - probs[chunk]) / (
                    counts[chunk, None] + 1
                )
                counts[chunk] += 1
        return 100.0 * (probs.argmax(-1) == labels).mean()

    if args.eval:
        state = ckpt.restore(state) or state
        if args.votes > 1:
            vote_fn = (evaluate_voting_kpconv if is_kpconv
                       else evaluate_voting)
            print(f"eval OA ({args.votes} votes): "
                  f"{vote_fn(state, args.votes):.2f}%")
        else:
            print(f"eval OA: {evaluate(state, confusion=args.confusion):.2f}%")
        return

    best_oa, step_count, start_epoch = 0.0, 0, 0
    if args.resume:
        restored = ckpt.restore_with_step(state)
        if restored is not None:
            state, start_epoch = restored
            start_epoch += 1
            best_oa = ckpt.best_metric() or 0.0
            print(f"resumed from epoch {start_epoch - 1} "
                  f"(best OA so far {best_oa:.2f}%)")
    for epoch in range(start_epoch, args.epochs):
        t0, seen = time.perf_counter(), 0
        pending = None
        if kp_sampler is not None:
            # reference epoch_n = epoch_steps × batch_num
            # (Modelnet40Config epoch_steps=300, ModelNet40.py:1402)
            from pointcloudlib_tpu.data import kpconv_cls_batches

            epoch_n = (args.steps_per_epoch or 300) * args.batch_size
            batches = kpconv_cls_batches(
                train_ds, args.batch_size, kp_sampler, kp_rng,
                epoch_n=min(epoch_n, len(train_ds)),
                bucket_of=kp_bcal.bucket_of if kp_bcal else None,
            )
        else:
            batches = cls_batches(
                train_ds, args.batch_size, shuffle=True,
                seed=args.seed + epoch, drop_last=True,
                with_normals=with_normals, workers=args.num_workers,
            )
        for i, batch in enumerate(prefetch(batches)):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            b_idx = batch.pop("bucket", None)
            batch = shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            step_fn = (bucket_steps[b_idx]
                       if bucket_steps is not None and b_idx is not None
                       else train_step)
            state, metrics = step_fn(state, batch, sub)
            pending = metrics  # fetch later — no per-step sync
            seen += args.batch_size
            step_count += 1
            if (i + 1) % args.log_every == 0:
                m = jax.device_get(pending)
                print(f"epoch {epoch} step {i+1}: "
                      f"loss={float(m['loss']):.4f} "
                      f"acc={float(m['acc'])*100:.2f}%")
        # fence with a VALUE fetch before timing: on the tunneled axon
        # platform block_until_ready can return at remote-enqueue time
        # (CLAUDE.md); only device_get reliably waits for compute
        m = (jax.device_get(pending) if pending is not None
             else {"loss": float("nan")})
        dt = time.perf_counter() - t0
        oa = evaluate(state)
        extra = ""
        if kp_sampler is not None:
            pot = kp_sampler.potentials
            extra = (f" potentials=[{pot.min():.2f},{pot.max():.2f}]"
                     f" (kpconv_augment active)")
        if float(m.get("voxel_overflow", 0)) > 0:
            # silent-truncation guard (pyramid caps clipped real
            # voxels in the LAST step of the epoch — re-calibrate)
            extra += (f" VOXEL-OVERFLOW={int(m['voxel_overflow'])} "
                      "(pyramid caps truncating; re-calibrate)")
        print(f"epoch {epoch}: loss={float(m['loss']):.4f} "
              f"test OA={oa:.2f}% "
              f"({seen/dt:.1f} samples/s){extra}")
        mlog.log("epoch", epoch=epoch, loss=float(m["loss"]), test_oa=oa,
                 samples_per_sec=seen / dt)
        ckpt.save(state, step=epoch, best=oa > best_oa, metric=oa)
        best_oa = max(best_oa, oa)
    print(f"best OA: {best_oa:.2f}%")


if __name__ == "__main__":
    main()
