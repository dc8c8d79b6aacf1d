#!/usr/bin/env python
"""Convergence A/B: reference-keyed torch PointConv partseg vs ours.

Round-3 VERDICT item 5 asks WHY pointconv-seg converges at ~1
IoU-pt/epoch when pointnet2-seg hits 87 in 10 epochs: defect in our
implementation, or the architecture itself? The decisive experiment is
to train the reference's exact module tree (the RefPointConvPartSeg
torch mirror from tests/test_torch_parity_pointconv.py — independent
weights, reference math incl. the density nets) on the SAME synthetic
ladder task with the SAME optimizer (flat SGD 0.01, momentum 0.9,
weight_decay 1e-4 — reference train_partseg.py:76) and compare IoU
trajectories epoch by epoch with our JAX model trained by the ladder
CLI. Matching curves = architectural, diverging = our defect.

Usage:
    python scripts/probe_pointconv_seg_convergence.py --epochs 10
    # ours, same budget (run separately; CPU or TPU):
    python train_partseg.py --model pointconv --synthetic \
        --synthetic-size 256 --epochs 10 --batch_size 16 --num_points 1024
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--num-points", type=int, default=1024)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model", default="pointconv",
                    choices=["pointconv", "pointnet2"],
                    help="pointnet2 = control arm (fast-converging "
                    "family through the same harness)")
    args = ap.parse_args()

    import torch

    from pointcloudlib_tpu.data.synthetic import SyntheticShapeNetPart
    from pointcloudlib_tpu.train.metrics import shape_ious

    torch.manual_seed(args.seed)
    if args.model == "pointconv":
        import test_torch_parity_pointconv as tpc

        # FPS indices are discrete — keep the 1023-step python loop out
        # of the autograd graph (it dominates wall time otherwise)
        _fps = tpc.torch_fps_noskip
        tpc.torch_fps_noskip = lambda xyz, m: _fps(xyz.detach(), m)

        net = tpc.RefPointConvPartSeg(part_num=50)

        def fwd(pts, lab):
            return net(pts)
    else:
        from test_torch_parity_pointnet2 import RefKeyedPointNet2PartSeg

        net = RefKeyedPointNet2PartSeg(part_num=50)

        def fwd(pts, lab):
            onehot = torch.nn.functional.one_hot(
                torch.from_numpy(lab).long(), 16).float()
            return net(pts, pts, onehot)
    opt = torch.optim.SGD(net.parameters(), lr=args.lr, momentum=0.9,
                          weight_decay=1e-4)

    train = SyntheticShapeNetPart(args.num_points, args.size, True,
                                  args.seed)
    test = SyntheticShapeNetPart(args.num_points, max(64, args.size // 4),
                                 False, args.seed)

    def batches(ds, bs, shuffle, rng):
        order = rng.permutation(len(ds)) if shuffle else np.arange(len(ds))
        for i in range(0, len(order) - bs + 1, bs):
            items = [ds[j] for j in order[i:i + bs]]
            pts = torch.from_numpy(np.stack([it[0] for it in items]))
            lab = np.array([it[1] for it in items])
            seg = torch.from_numpy(np.stack([it[2] for it in items]))
            yield pts, lab, seg

    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        net.train()
        t0 = time.time()
        for pts, lab, seg in batches(train, args.batch_size, True, rng):
            opt.zero_grad()
            logits = fwd(pts, lab)  # [B, N, 50]
            loss = torch.nn.functional.cross_entropy(
                logits.reshape(-1, 50), seg.reshape(-1).long())
            loss.backward()
            opt.step()
        net.eval()
        ious, correct, total = [], 0, 0
        with torch.no_grad():
            for pts, lab, seg in batches(test, args.batch_size, False, rng):
                pred = fwd(pts, lab).argmax(-1).numpy()
                ious.extend(shape_ious(pred, seg.numpy(), lab))
                correct += (pred == seg.numpy()).sum()
                total += seg.numel()
        print(json.dumps({
            "arm": f"torch-ref-{args.model}", "epoch": epoch,
            "iou": round(100 * float(np.mean(ious)), 2),
            "acc": round(float(100 * correct / total), 2),
            "loss": round(float(loss), 4),
            "secs": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
