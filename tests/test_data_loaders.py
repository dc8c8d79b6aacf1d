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


class TestWorkerPool:
    """Fork-pool batch assembly (data/workers.py) and the vectorized
    ModelNet40.get_batch path."""

    def test_pool_matches_serial_contract(self):
        ds = SyntheticModelNet(n_points=32, size=20, train=False)
        serial = list(cls_batches(ds, batch_size=8, shuffle=True, seed=3))
        pooled = list(cls_batches(ds, batch_size=8, shuffle=True, seed=3,
                                  workers=2))
        assert len(serial) == len(pooled)
        for a, b in zip(serial, pooled):
            assert a["xyz"].shape == b["xyz"].shape
            np.testing.assert_array_equal(a["label"], b["label"])
            np.testing.assert_array_equal(a["valid"], b["valid"])
            # eval datasets draw no augment randomness → identical
            np.testing.assert_allclose(a["xyz"], b["xyz"])

    def test_seg_pool(self):
        ds = SyntheticShapeNetPart(n_points=32, size=10, train=False)
        serial = list(seg_batches(ds, batch_size=4))
        pooled = list(seg_batches(ds, batch_size=4, workers=2))
        assert len(serial) == len(pooled)
        for a, b in zip(serial, pooled):
            np.testing.assert_array_equal(a["seg"], b["seg"])
            np.testing.assert_allclose(a["xyz"], b["xyz"])


class TestGetBatchFastPath:
    def _mk(self, **kw):
        from pointcloudlib_tpu.data.modelnet40 import ModelNet40

        ds = ModelNet40.__new__(ModelNet40)
        ds.n_points = 16
        ds.train = kw.get("train", False)
        ds.augment = kw.get("augment", False)
        ds.permute = kw.get("permute", False)
        ds._rng = np.random.default_rng(0)
        rng = np.random.default_rng(1)
        ds._data = (
            rng.standard_normal((6, 64, 6)).astype(np.float32),
            np.arange(6, dtype=np.int32),
        )
        return ds

    def test_matches_item_path_deterministic(self):
        """permute=False, augment=False: the vectorized batch equals
        stacked __getitem__ items exactly."""
        ds = self._mk()
        idx = np.array([4, 0, 2])
        bp, bn, bl = ds.get_batch(idx)
        for row, i in enumerate(idx):
            p, n, l = ds[int(i)]
            np.testing.assert_allclose(bp[row], p, rtol=1e-6, atol=1e-6)
            np.testing.assert_array_equal(bn[row], n)
            assert bl[row] == l

    def test_permuted_batch_statistics(self):
        """permute=True: rows are unit-sphere normalized subsets of the
        source cloud (set membership, no duplicates)."""
        ds = self._mk(permute=True)
        idx = np.array([1, 3])
        bp, bn, _ = ds.get_batch(idx)
        assert bp.shape == (2, 16, 3)
        for row, i in enumerate(idx):
            src = ds._data[0][i][:, 3:6]
            # all normal rows must come from the source cloud
            matches = (bn[row][:, None, :] == src[None]).all(-1).any(1)
            assert matches.all()
            # no duplicate selections
            assert len(np.unique(bn[row], axis=0)) == 16

    def test_cls_batches_uses_fast_path(self):
        ds = self._mk()
        batches = list(cls_batches(ds, batch_size=4))
        assert len(batches) == 2
        assert batches[-1]["valid"].sum() == 2
        assert batches[0]["xyz"].shape == (4, 16, 3)
