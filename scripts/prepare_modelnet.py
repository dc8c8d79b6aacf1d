#!/usr/bin/env python
"""Offline ModelNet40 preparation with the native library.

The reference's KPConv path grid-subsamples every cloud once at
dl=0.02 and caches pickles (kpconv_loader.py:614-694). This tool does
the same job on the txt tree using the C++ preprocessing library and
writes one compressed .npz per split:

    python scripts/prepare_modelnet.py --data-root data/modelnet40_normal_resampled \
        --dl 0.02 --max-points 4096 --out data/modelnet40_dl02.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from pointcloudlib_tpu import native  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--dl", type=float, default=0.02)
    p.add_argument("--max-points", type=int, default=4096)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    root = Path(args.data_root)
    cats = [l.strip() for l in open(root / "modelnet40_shape_names.txt")]
    for split in ("train", "test"):
        ids = [l.strip() for l in open(root / f"modelnet40_{split}.txt")]
        pts_out = np.zeros((len(ids), args.max_points, 6), np.float32)
        counts = np.zeros(len(ids), np.int32)
        labels = np.zeros(len(ids), np.int32)
        for i, sid in enumerate(ids):
            cat = "_".join(sid.split("_")[:-1])
            arr = np.loadtxt(root / cat / f"{sid}.txt", delimiter=",",
                             dtype=np.float32)
            sub_p, sub_n = native.grid_subsample(
                arr[:, :3], args.dl, features=arr[:, 3:6],
                max_out=args.max_points,
            )
            k = len(sub_p)
            pts_out[i, :k, :3] = sub_p
            pts_out[i, :k, 3:] = sub_n
            counts[i] = k
            labels[i] = cats.index(cat)
            if i % 500 == 0:
                print(f"{split}: {i}/{len(ids)}", flush=True)
        out = Path(args.out).with_suffix("")
        np.savez_compressed(
            f"{out}_{split}.npz", points=pts_out, counts=counts,
            labels=labels,
        )
        print(f"wrote {out}_{split}.npz")


if __name__ == "__main__":
    main()
