#!/usr/bin/env python
"""Torch-mirror ground truth for every accuracy-ladder floor.

Round-3 VERDICT item 8: every ladder floor except pointconv's was
"round-2 measured minus ~20%" — self-referential (a family-wide
dynamics regression baked into round 2 would have set its own floor).
This script trains the INDEPENDENT torch mirrors (the reference-keyed
module trees from tests/test_torch_parity*.py, full-scale configs
matching our models, torch's own default init = the init we match,
f32 math) at the EXACT ladder budget with the EXACT CLI optimizer:

  cls: SyntheticModelNet  512 items, N=512,  bs=32, 10 epochs,
       SGD lr=0.02 momentum=0.9            (train_cls.py defaults)
  seg: SyntheticShapeNetPart 256 items, N=1024, bs=16, 10 epochs,
       SGD lr=0.01 momentum=0.9 wd=1e-4    (train_partseg.py defaults)

and prints best OA / best instance-mean shape-IoU per family — the
mirror values accuracy_ladder.py floors cite. kpconv has no full-model
torch mirror (op-level parity only, tests/test_torch_parity_kpconv.py)
so its rows keep self-based floors, documented in the LADDER table.

CPU-only (torch arm). Results append to mirror_ladder.jsonl.

Usage:
    python scripts/mirror_ladder.py                    # all rows
    python scripts/mirror_ladder.py --only cls/dgcnn,seg/pointnet
    python scripts/mirror_ladder.py --seed 1           # noise probe
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


# ---------------------------------------------------------------- builders
# Each returns (net, fwd) with fwd(pts_torch [B,N,3] f32, lab_np [B])
# -> logits ([B, n_cls] for cls, [B, N, 50] for seg).

def _fast_fps(mod, name="torch_fps"):
    """Swap a mirror's per-step python FPS loop for the native/numpy
    implementation (pointcloudlib_tpu.native.fps — same algorithm,
    parity-tested vs the scan oracle). FPS is a discrete selection with
    no gradient, so this changes nothing about the training dynamics;
    the pure-torch loop costs ~600 s/epoch at the pn2 ladder shape."""
    import torch

    from pointcloudlib_tpu import native

    orig = getattr(mod, name)
    skip = "noskip" not in name

    def fps(xyz, m):
        pts = xyz.detach().numpy()
        idx = np.stack([native.fps(p, m, skip) for p in pts])
        return torch.from_numpy(idx.astype(np.int64))

    setattr(mod, name, fps)
    return orig

def _onehot(lab, n=16):
    import torch

    return torch.nn.functional.one_hot(
        torch.from_numpy(lab).long(), n).float()


def b_cls_pointnet():
    from test_torch_parity import TorchPointNet

    net = TorchPointNet(n_classes=40)
    return net, lambda pts, lab, nrm: net(pts.transpose(1, 2))


def b_cls_pointnet2(msg=False):
    import test_torch_parity_pointnet2 as m

    _fast_fps(m, "torch_fps")
    net = m.RefKeyedPointNet2(n_classes=40, msg=msg)
    # normals ride as feats (train_cls.py with_normals for pointnet2*)
    return net, lambda pts, lab, nrm: net(pts, nrm)


def b_cls_dgcnn():
    from test_torch_parity import TorchDGCNN

    net = TorchDGCNN(n_classes=40, k=20)
    return net, lambda pts, lab, nrm: net(pts.transpose(1, 2))


def b_cls_pointcnn():
    import test_torch_parity_pointcnn as m
    from test_torch_parity_pointcnn import TPointCNN

    _fast_fps(m, "torch_fps_skip")
    net = TPointCNN(n_classes=40)
    return net, lambda pts, lab, nrm: net(pts)


def b_cls_pointconv():
    import test_torch_parity_pointconv as tpc

    _fast_fps(tpc, "torch_fps_noskip")
    net = tpc.TorchPointConv(n_classes=40)
    return net, lambda pts, lab, nrm: net(pts)


def b_seg_pointnet():
    from test_torch_parity_partseg import TorchPointNetSeg

    net = TorchPointNetSeg(part_num=50)
    return net, lambda pts, lab: net(pts.transpose(1, 2), _onehot(lab))


def b_seg_pointnet2():
    import torch

    import test_torch_parity_pointnet2 as m

    _fast_fps(m, "torch_fps")
    net = m.RefKeyedPointNet2PartSeg(part_num=50)
    # the parity-test class carries test-scale SA configs; swap in the
    # full-scale ones our model trains (models/pointnet2.py:101-111)
    net.pointnet_modules = torch.nn.ModuleList([
        m.RefKeyedSA(3, [[64, 64, 128]], 512, [0.2], [64]),
        m.RefKeyedSA(128, [[128, 128, 256]], 128, [0.4], [64]),
        m.RefKeyedSA(256, [[256, 512, 1024]]),
    ])
    return net, lambda pts, lab: net(pts, pts, _onehot(lab))


def b_seg_dgcnn():
    from test_torch_parity_partseg import RefDGCNNPartSeg

    net = RefDGCNNPartSeg(part_num=50, k=40)
    return net, lambda pts, lab: net(pts.transpose(1, 2), _onehot(lab))


def b_seg_pointcnn():
    import test_torch_parity_pointcnn as m

    _fast_fps(m, "torch_fps_skip")
    net = m.RPointCNNPartSeg(part_num=50)
    return net, lambda pts, lab: net(pts)


def b_seg_pointconv():
    import test_torch_parity_pointconv as tpc

    _fast_fps(tpc, "torch_fps_noskip")
    net = tpc.RefPointConvPartSeg(part_num=50)
    return net, lambda pts, lab: net(pts)


ROWS = [
    ("cls", "pointnet", b_cls_pointnet, {}),
    ("cls", "pointnet2", lambda: b_cls_pointnet2(False), {}),
    ("cls", "pointnet2_msg", lambda: b_cls_pointnet2(True), {}),
    ("cls", "dgcnn", b_cls_dgcnn, {}),
    ("cls", "pointcnn", b_cls_pointcnn, {}),
    ("cls", "pointconv", b_cls_pointconv, {}),
    ("seg", "pointnet", b_seg_pointnet, {}),
    ("seg", "pointnet2", b_seg_pointnet2, {}),
    ("seg", "dgcnn", b_seg_dgcnn, {}),
    ("seg", "pointcnn", b_seg_pointcnn, {}),
    # the ladder gives seg/pointconv a 40-epoch budget (slow family,
    # accuracy_ladder.py LADDER) — the mirror gets the same
    ("seg", "pointconv", b_seg_pointconv, {"epochs": 40}),
]


def run_cls(build, epochs, seed):
    import torch

    from pointcloudlib_tpu.data.synthetic import SyntheticModelNet

    torch.manual_seed(seed)
    net, fwd = build()
    opt = torch.optim.SGD(net.parameters(), lr=0.02, momentum=0.9)
    train = SyntheticModelNet(512, 40, 512, True, seed)
    test = SyntheticModelNet(512, 40, 128, False, seed)

    def batches(ds, bs, shuffle, rng):
        order = rng.permutation(len(ds)) if shuffle else np.arange(len(ds))
        for i in range(0, len(order) - bs + 1, bs):
            items = [ds[j] for j in order[i:i + bs]]
            pts = torch.from_numpy(
                np.stack([it[0] for it in items]).astype(np.float32))
            nrm = torch.from_numpy(
                np.stack([it[1] for it in items]).astype(np.float32))
            lab = np.array([it[2] for it in items])
            yield pts, nrm, lab

    rng = np.random.default_rng(seed)
    best, curve = 0.0, []
    for epoch in range(epochs):
        net.train()
        t0 = time.time()
        for pts, nrm, lab in batches(train, 32, True, rng):
            opt.zero_grad()
            logits = fwd(pts, lab, nrm)
            loss = torch.nn.functional.cross_entropy(
                logits, torch.from_numpy(lab).long())
            loss.backward()
            opt.step()
        net.eval()
        correct = total = 0
        with torch.no_grad():
            for pts, nrm, lab in batches(test, 32, False, rng):
                pred = fwd(pts, lab, nrm).argmax(-1).numpy()
                correct += int((pred == lab).sum())
                total += len(lab)
        oa = 100.0 * correct / total
        best = max(best, oa)
        curve.append(round(oa, 2))
        print(f"  epoch {epoch}: OA {oa:.2f}%  ({time.time()-t0:.0f}s)",
              flush=True)
    return best, curve


def run_seg(build, epochs, seed):
    import torch

    from pointcloudlib_tpu.data.synthetic import SyntheticShapeNetPart
    from pointcloudlib_tpu.train.metrics import shape_ious

    torch.manual_seed(seed)
    net, fwd = build()
    opt = torch.optim.SGD(net.parameters(), lr=0.01, momentum=0.9,
                          weight_decay=1e-4)
    train = SyntheticShapeNetPart(1024, 256, True, seed)
    test = SyntheticShapeNetPart(1024, 64, False, seed)

    def batches(ds, bs, shuffle, rng):
        order = rng.permutation(len(ds)) if shuffle else np.arange(len(ds))
        for i in range(0, len(order) - bs + 1, bs):
            items = [ds[j] for j in order[i:i + bs]]
            pts = torch.from_numpy(
                np.stack([it[0] for it in items]).astype(np.float32))
            lab = np.array([it[1] for it in items])
            seg = torch.from_numpy(np.stack([it[2] for it in items]))
            yield pts, lab, seg

    rng = np.random.default_rng(seed)
    best, curve = 0.0, []
    for epoch in range(epochs):
        net.train()
        t0 = time.time()
        for pts, lab, seg in batches(train, 16, True, rng):
            opt.zero_grad()
            logits = fwd(pts, lab)
            loss = torch.nn.functional.cross_entropy(
                logits.reshape(-1, 50), seg.reshape(-1).long())
            loss.backward()
            opt.step()
        net.eval()
        ious = []
        with torch.no_grad():
            for pts, lab, seg in batches(test, 16, False, rng):
                pred = fwd(pts, lab).argmax(-1).numpy()
                ious.extend(shape_ious(pred, seg.numpy(), lab))
        iou = 100.0 * float(np.mean(ious))
        best = max(best, iou)
        curve.append(round(iou, 2))
        print(f"  epoch {epoch}: IoU {iou:.2f}%  ({time.time()-t0:.0f}s)",
              flush=True)
    return best, curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated task/model filters")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override every row's budget (smoke tests)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log = ROOT / "mirror_ladder.jsonl"
    for task, model, build, opts in ROWS:
        if only and f"{task}/{model}" not in only and model not in only:
            continue
        epochs = args.epochs or opts.get("epochs", 10)
        print(f"== {task}/{model} (mirror, {epochs} epochs, "
              f"seed {args.seed})", flush=True)
        t0 = time.time()
        try:
            if task == "cls":
                best, curve = run_cls(build, epochs, args.seed)
            else:
                best, curve = run_seg(build, epochs, args.seed)
        except Exception as e:  # keep the sweep going; record the row
            print(f"  ERROR: {e}", flush=True)
            best, curve = None, [f"error: {e}"]
        rec = {
            "ts": time.time(), "task": task, "model": model,
            "mirror_best": best, "curve": curve, "seed": args.seed,
            "epochs": epochs, "seconds": round(time.time() - t0, 1),
        }
        with log.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"-- {task}/{model} mirror best: {best}", flush=True)


if __name__ == "__main__":
    main()
