#!/usr/bin/env python
"""Fetch and prepare the benchmark datasets (reference first-run parity).

The reference downloads both datasets on first use
(data_utils/modelnet40_loader.py:26-40 curl + unzip,
data_utils/shapenet_loader.py:12-22 wget + unzip); our loaders require
the trees to pre-exist. This script closes the gap on connected
machines:

  python scripts/download_data.py modelnet40  [--root data]
  python scripts/download_data.py shapenetpart [--root data]
  python scripts/download_data.py all

After download, ModelNet40's txt tree is converted once into the fast
``.npz`` cache the loader uses (data/modelnet40.py:_load_txt_tree does
this lazily too — doing it here front-loads the one-time cost).

Zero-egress environments: the download fails fast with a pointer to
``--synthetic`` (the procedural stand-in datasets).
"""

from __future__ import annotations

import argparse
import ssl
import sys
import urllib.request
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# the reference's sources (shapenet.cs.stanford.edu serves an expired
# chain, hence the unverified context — the reference passes curl -k /
# wget --no-check-certificate for the same reason)
URLS = {
    "modelnet40": (
        "https://shapenet.cs.stanford.edu/media/"
        "modelnet40_normal_resampled.zip"
    ),
    "shapenetpart": (
        "https://shapenet.cs.stanford.edu/media/"
        "shapenet_part_seg_hdf5_data.zip"
    ),
}
DIRS = {
    "modelnet40": "modelnet40_normal_resampled",
    "shapenetpart": "shapenet_part_seg_hdf5_data",
}


def _download(url: str, dest: Path) -> None:
    print(f"downloading {url} -> {dest}")
    ctx = ssl._create_unverified_context()
    try:
        with urllib.request.urlopen(url, context=ctx, timeout=60) as r, \
                open(dest, "wb") as f:
            total = int(r.headers.get("Content-Length") or 0)
            got = 0
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                got += len(chunk)
                if total:
                    print(f"\r  {got/1e6:.0f}/{total/1e6:.0f} MB",
                          end="", flush=True)
            print()
    except OSError as e:
        dest.unlink(missing_ok=True)
        raise SystemExit(
            f"download failed ({e}). On zero-egress machines train with "
            "--synthetic, or place the extracted tree at the loader's "
            "--data-root yourself."
        )


def fetch(name: str, root: Path) -> None:
    out_dir = root / DIRS[name]
    if out_dir.exists():
        print(f"{out_dir} already exists — skipping download")
    else:
        root.mkdir(parents=True, exist_ok=True)
        zip_path = root / f"{DIRS[name]}.zip"
        if not zip_path.exists():
            _download(URLS[name], zip_path)
        print(f"extracting {zip_path}")
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(root)
        zip_path.unlink()
    if name == "modelnet40":
        # build the npz caches now (otherwise the first training run
        # pays the ~10 min txt parse)
        from pointcloudlib_tpu.data.modelnet40 import ModelNet40

        for train in (True, False):
            print(f"building {'train' if train else 'test'} cache …")
            ds = ModelNet40(train=train, data_root=str(out_dir))
            print(f"  {len(ds)} items")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("dataset", choices=[*URLS, "all"])
    p.add_argument("--root", default="data",
                   help="directory to place the dataset trees in "
                        "(the CLIs' default --data-root parent)")
    args = p.parse_args()
    names = list(URLS) if args.dataset == "all" else [args.dataset]
    for name in names:
        fetch(name, Path(args.root))


if __name__ == "__main__":
    main()
