#!/usr/bin/env python
"""Convergence ground truth for the cls/pointconv accuracy-ladder floor.

Round 3 moved every linear to the reference's init
(``reference_linear_init``, kaiming_uniform(a=sqrt(5))), and cls/pointconv
dropped from 42.2 to 25-30 OA at the 10-epoch ladder budget — below its
floor of 33 (accuracy_ladder.jsonl). A gated A/B
(``POINTCLOUDLIB_REF_INIT=0``) restores 35.9, so the init is the cause,
not a math defect. The question this probe answers: is slow 10-epoch
convergence under that init a property of the REFERENCE architecture
itself?  Train the reference-keyed torch mirror
(tests/test_torch_parity_pointconv.py TorchPointConv — independent
weights, torch's own default init = the one we now match, f32 math) on
the SAME synthetic ladder task with the SAME optimizer as train_cls.py
(flat SGD lr=0.02, momentum 0.9) and compare best OA.

 * mirror lands ~25-30 too -> our dynamics match the reference; the
   ladder floor was baselined on the old lecun init and must be
   re-based, not the model fixed.
 * mirror lands ~40+      -> a real interaction defect on our side.

CPU-only (torch arm). Usage:
    python scripts/probe_pointconv_cls_convergence.py --epochs 10
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
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-points", type=int, default=512)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    from pointcloudlib_tpu.data.synthetic import SyntheticModelNet

    torch.manual_seed(args.seed)
    import test_torch_parity_pointconv as tpc

    # FPS indices are discrete — keep the python loop out of autograd
    _fps = tpc.torch_fps_noskip
    tpc.torch_fps_noskip = lambda xyz, m: _fps(xyz.detach(), m)

    net = tpc.TorchPointConv(n_classes=40)
    opt = torch.optim.SGD(net.parameters(), lr=args.lr, momentum=0.9)

    train = SyntheticModelNet(args.num_points, 40, args.size, True,
                              args.seed)
    test = SyntheticModelNet(args.num_points, 40, max(64, args.size // 4),
                             False, args.seed)

    def batches(ds, bs, shuffle, rng):
        order = rng.permutation(len(ds)) if shuffle else np.arange(len(ds))
        for i in range(0, len(order) - bs + 1, bs):
            items = [ds[j] for j in order[i:i + bs]]
            pts = torch.from_numpy(np.stack([it[0] for it in items]))
            lab = torch.from_numpy(
                np.array([it[2] for it in items], dtype=np.int64))
            yield pts, lab

    rng = np.random.default_rng(args.seed)
    best = 0.0
    for epoch in range(args.epochs):
        net.train()
        t0 = time.time()
        for pts, lab in batches(train, args.batch_size, True, rng):
            opt.zero_grad()
            loss = torch.nn.functional.cross_entropy(net(pts), lab)
            loss.backward()
            opt.step()
        net.eval()
        correct, total = 0, 0
        with torch.no_grad():
            for pts, lab in batches(test, args.batch_size, False, rng):
                pred = net(pts).argmax(-1)
                correct += int((pred == lab).sum())
                total += len(lab)
        oa = 100.0 * correct / total
        best = max(best, oa)
        print(json.dumps({
            "arm": "torch-ref-pointconv-cls", "epoch": epoch,
            "oa": round(oa, 2), "loss": round(float(loss), 4),
            "secs": round(time.time() - t0, 1),
        }), flush=True)
    print(f"best OA: {best:.2f}%")


if __name__ == "__main__":
    main()
