"""Real-file loader paths exercised against tiny generated fixtures."""

import numpy as np
import pytest

from pointcloudlib_tpu.data import cls_batches, seg_batches
from pointcloudlib_tpu.data.modelnet40 import ModelNet40
from pointcloudlib_tpu.data.shapenet import ShapeNetPart
from pointcloudlib_tpu.data.synthetic import (
    SyntheticModelNet,
    SyntheticShapeNetPart,
)


@pytest.fixture
def modelnet_tree(tmp_path):
    """Two-category, two-shapes-each ModelNet40-format txt tree."""
    rng = np.random.default_rng(0)
    cats = ["airplane", "bed"]
    (tmp_path / "modelnet40_shape_names.txt").write_text("\n".join(cats) + "\n")
    train_ids, test_ids = [], []
    for c in cats:
        (tmp_path / c).mkdir()
        for i in (1, 2):
            sid = f"{c}_{i:04d}"
            pts = rng.standard_normal((64, 6)).astype(np.float32)
            np.savetxt(tmp_path / c / f"{sid}.txt", pts, delimiter=",")
            (train_ids if i == 1 else test_ids).append(sid)
    (tmp_path / "modelnet40_train.txt").write_text("\n".join(train_ids) + "\n")
    (tmp_path / "modelnet40_test.txt").write_text("\n".join(test_ids) + "\n")
    return tmp_path


class TestModelNet40TxtTree:
    def test_load_and_contract(self, modelnet_tree):
        ds = ModelNet40(n_points=32, train=False, data_root=str(modelnet_tree))
        assert len(ds) == 2
        pts, nrm, label = ds[0]
        assert pts.shape == (32, 3) and nrm.shape == (32, 3)
        assert label in (0, 1)
        # unit-sphere normalization
        assert np.linalg.norm(pts, axis=1).max() <= 1.0 + 1e-5

    def test_npz_cache_created_and_reused(self, modelnet_tree):
        ModelNet40(n_points=16, train=False, data_root=str(modelnet_tree))
        assert (modelnet_tree / "cache_test.npz").exists()
        ds2 = ModelNet40(n_points=16, train=False, data_root=str(modelnet_tree))
        assert len(ds2) == 2

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ModelNet40(data_root=str(tmp_path / "nope"))


@pytest.fixture
def shapenet_h5(tmp_path):
    import h5py

    rng = np.random.default_rng(1)
    for split, n in [("train0", 6), ("val0", 2), ("test0", 4)]:
        with h5py.File(tmp_path / f"ply_data_{split}.h5", "w") as h:
            h["data"] = rng.standard_normal((n, 128, 3)).astype(np.float32)
            h["label"] = rng.integers(0, 16, (n, 1)).astype(np.uint8)
            h["pid"] = rng.integers(0, 50, (n, 128)).astype(np.uint8)
    return tmp_path


class TestShapeNetH5:
    def test_trainval_concat(self, shapenet_h5):
        ds = ShapeNetPart("trainval", n_points=64, data_root=str(shapenet_h5))
        assert len(ds) == 8  # 6 train + 2 val
        pts, label, seg = ds[0]
        assert pts.shape == (64, 3) and seg.shape == (64,)
        assert 0 <= label < 16

    def test_test_split(self, shapenet_h5):
        ds = ShapeNetPart("test", n_points=64, data_root=str(shapenet_h5))
        assert len(ds) == 4


class TestBatching:
    def test_cls_batch_padding_mask(self):
        ds = SyntheticModelNet(n_points=32, size=10, train=False)
        batches = list(cls_batches(ds, batch_size=4))
        assert len(batches) == 3
        assert batches[-1]["valid"].sum() == 2  # 10 = 4+4+2
        assert batches[-1]["xyz"].shape == (4, 32, 3)

    def test_seg_drop_last(self):
        ds = SyntheticShapeNetPart(n_points=32, size=10, train=True)
        batches = list(seg_batches(ds, batch_size=4, drop_last=True))
        assert len(batches) == 2
