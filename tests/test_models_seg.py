"""Golden-shape tests for part-segmentation models + IoU metric tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu.models import SEG_MODELS, get_seg_model
from pointcloudlib_tpu.train.metrics import INDEX_START, SEG_NUM, shape_ious

B, N = 2, 128


@pytest.mark.parametrize("name", sorted(SEG_MODELS))
def test_seg_forward_shape(name):
    model = get_seg_model(name, part_num=50)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    one_hot = jnp.asarray(np.eye(16, dtype=np.float32)[[0, 5]])
    feats = xyz if name.startswith("pointnet2") else None
    variables = model.init(
        jax.random.key(0), xyz, one_hot, feats=feats, training=False
    )
    logits = model.apply(variables, xyz, one_hot, feats=feats, training=False)
    assert logits.shape == (B, N, 50)
    assert np.isfinite(np.asarray(logits)).all()


class TestShapeIoU:
    def test_perfect_prediction(self):
        seg = np.array([[0, 1, 2, 3, 0, 1]])
        ious = shape_ious(seg, seg, np.array([0]))
        np.testing.assert_allclose(ious, [1.0])

    def test_empty_union_counts_as_one(self):
        # category 0 has parts 0-3; only parts 0,1 present & predicted
        seg = np.array([[0, 0, 1, 1]])
        pred = np.array([[0, 1, 1, 1]])
        ious = shape_ious(pred, seg, np.array([0]))
        # part0: I=1 U=2 → .5 ; part1: I=2 U=3 → 2/3 ; parts 2,3: U=0 → 1
        np.testing.assert_allclose(ious, [(0.5 + 2 / 3 + 1 + 1) / 4])

    def test_category_ranges(self):
        assert INDEX_START[-1] + SEG_NUM[-1] == 50
