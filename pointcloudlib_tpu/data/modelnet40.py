"""ModelNet40 dataset (real files when present, synthetic fallback).

The reference loader (data_utils/modelnet40_loader.py) downloads
``modelnet40_normal_resampled`` txt files and caches them into lmdb with
msgpack. Here: if the txt tree (or an ``.npz`` cache) exists under
``data_root``, we read it (converting once to a fast ``.npz``); with no
files and ``synthetic=True`` we serve the procedural stand-in — same item
contract either way: ``(pts [N,3], normals [N,3], label)``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from pointcloudlib_tpu.data import augment as A
from pointcloudlib_tpu.data.synthetic import SyntheticModelNet

_CATEGORY_FILE = "modelnet40_shape_names.txt"


class ModelNet40:
    """Item contract of the reference lmdb loader
    (modelnet40_loader.py:75-132): take the first ``n_points`` of a
    shuffled permutation, split xyz/normals, normalize xyz to the unit
    sphere, and in training apply anisotropic scale + translate."""

    def __init__(
        self,
        n_points: int = 1024,
        train: bool = True,
        data_root: Optional[str] = None,
        seed: int = 0,
        augment: Optional[bool] = None,
        permute: Optional[bool] = None,
    ):
        self.n_points = n_points
        self.train = train
        # voting eval re-augments the test split (reference
        # classification_test, train_cls.py:230-328)
        self.augment = train if augment is None else augment
        # point selection (random permutation) decoupled from the
        # scale/translate augment: the KPConv path wants fresh point
        # subsets per epoch but applies its own augmentation_transform
        # (kpconv_augment) instead of the ModelNet one
        self.permute = self.augment if permute is None else permute
        self._rng = np.random.default_rng(seed)
        self._data = None  # (points [M, 10000, 6], labels [M])
        root = Path(data_root) if data_root else None
        if root and (root / _CATEGORY_FILE).exists():
            self._load_txt_tree(root)
        elif root and root.with_suffix(".npz").exists():
            # single-archive mode must distinguish splits: accept
            # points_train/points_test keys, or plain points/labels
            # ONLY when labeled with a matching 'split' scalar — never
            # silently serve the same rows as both train and test
            z = np.load(root.with_suffix(".npz"))
            sp = "train" if train else "test"
            if f"points_{sp}" in z:
                self._data = (z[f"points_{sp}"], z[f"labels_{sp}"])
            elif "split" in z and str(z["split"]) == sp:
                self._data = (z["points"], z["labels"])
            else:
                raise FileNotFoundError(
                    f"{root.with_suffix('.npz')} has no '{sp}' split "
                    f"(keys: {sorted(z.keys())}); a single archive "
                    "needs points_train/labels_train + points_test/"
                    "labels_test, or a split='train'|'test' marker"
                )
        else:
            raise FileNotFoundError(
                f"ModelNet40 files not found under {data_root!r}; "
                "pass --synthetic to train without the real dataset"
            )

    def _load_txt_tree(self, root: Path):
        cache = root / f"cache_{'train' if self.train else 'test'}.npz"
        if cache.exists():
            z = np.load(cache)
            self._data = (z["points"], z["labels"])
            return
        cats = [l.strip() for l in open(root / _CATEGORY_FILE)]
        split = "train" if self.train else "test"
        ids = [l.strip() for l in open(root / f"modelnet40_{split}.txt")]
        pts_all, labels = [], []
        for sid in ids:
            cat = "_".join(sid.split("_")[:-1])
            arr = np.loadtxt(root / cat / f"{sid}.txt", delimiter=",",
                             dtype=np.float32)
            pts_all.append(arr)
            labels.append(cats.index(cat))
        self._data = (
            np.stack(pts_all),
            np.asarray(labels, np.int32),
        )
        np.savez_compressed(cache, points=self._data[0], labels=self._data[1])

    def __len__(self):
        return len(self._data[1])

    def __getitem__(self, i: int):
        raw, label = self._data[0][i], int(self._data[1][i])
        if self.permute:
            sel = self._rng.permutation(raw.shape[0])[: self.n_points]
        else:
            sel = np.arange(self.n_points)
        item = raw[sel]
        pts, nrm = item[:, :3], item[:, 3:6]
        pts = A.normalize_unit_sphere(pts)
        if self.augment:
            pts = A.random_scale_translate(pts, self._rng)
        return pts.astype(np.float32), nrm.astype(np.float32), label

    def get_batch(self, idx: np.ndarray):
        """Vectorized batch fetch: one numpy call per stage for the
        whole batch — ~4x the per-item loop's feed rate on a single
        core (scripts/bench_feed_rate.py), same per-item semantics
        (subset distribution, normalization, augment draws).

        Returns ``(pts [b, n, 3], normals [b, n, 3], labels [b])``.
        """
        all_pts, m = self._data[0], self._data[0].shape[1]
        b = len(idx)
        if self.permute:
            sel = A.subsample_rows_batch(m, self.n_points, b, self._rng)
            # one fused fancy-index from the full cache: measured ~1.7x
            # faster than materializing [b, M, 6] then take_along_axis
            item = all_pts[np.asarray(idx)[:, None], sel]
        else:
            item = all_pts[idx][:, : self.n_points]
        pts, nrm = item[..., :3], item[..., 3:6]
        pts = A.normalize_unit_sphere_batch(pts)
        if self.augment:
            pts = A.random_scale_translate_batch(pts, self._rng)
        return (pts.astype(np.float32), nrm.astype(np.float32),
                self._data[1][idx].astype(np.int32))


def make_modelnet40(
    n_points: int,
    train: bool,
    data_root: Optional[str] = None,
    synthetic: bool = False,
    synthetic_size: int = 512,
    seed: int = 0,
    augment: Optional[bool] = None,
    permute: Optional[bool] = None,
):
    if synthetic:
        return SyntheticModelNet(
            n_points=n_points, train=train, size=synthetic_size, seed=seed,
            augment=augment,
        )
    return ModelNet40(n_points=n_points, train=train, data_root=data_root,
                      seed=seed, augment=augment, permute=permute)
