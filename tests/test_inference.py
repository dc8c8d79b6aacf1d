"""Inference API tests (CPU): bucketing, batching, checkpoint restore."""

import numpy as np
import jax

from pointcloudlib_tpu.inference import Predictor, SegPredictor, _bucket
from pointcloudlib_tpu.models import get_cls_model
from pointcloudlib_tpu.train import create_train_state, sgd_momentum, step_decay
from pointcloudlib_tpu.utils.checkpoint import CheckpointManager


def test_bucketing():
    assert _bucket(100) == 128
    assert _bucket(128) == 128
    assert _bucket(129) == 256
    assert _bucket(5000) == 5000


def test_predictor_from_checkpoint_roundtrip(tmp_path):
    model = get_cls_model("pointnet", n_classes=40)
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(model, jax.random.key(0), xyz, None, tx)
    mgr = CheckpointManager(tmp_path / "m")
    mgr.save(state, step=0, best=True)

    p = Predictor.from_checkpoint(tmp_path / "m", "pointnet",
                                  sample_points=64)
    # restored params must equal the saved ones
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(p.variables["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    clouds = rng.standard_normal((3, 50, 3)).astype(np.float32)  # odd B, N
    probs = p.predict_proba(clouds)
    assert probs.shape == (3, 40)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_seg_predictor_shapes(tmp_path):
    import pytest

    # a missing checkpoint dir must be a hard error, never silent
    # randomly-initialized serving
    with pytest.raises(FileNotFoundError):
        SegPredictor.from_checkpoint(tmp_path / "missing", "pointnet",
                                     sample_points=64)

    from pointcloudlib_tpu.models import get_seg_model
    from pointcloudlib_tpu.train.state import init_variables
    import jax
    import jax.numpy as jnp

    model = get_seg_model("pointnet", part_num=50)
    variables = init_variables(
        model, jax.random.key(0), jnp.zeros((1, 64, 3)),
        jnp.zeros((1, 16)))
    p = SegPredictor(model, variables)
    rng = np.random.default_rng(1)
    clouds = rng.standard_normal((2, 64, 3)).astype(np.float32)
    pred = p.predict(clouds, labels=np.array([0, 5]))
    assert pred.shape == (2, 64)
    assert (pred >= 0).all() and (pred < 50).all()


def test_padding_exact_for_pointnet():
    """Repetition padding is exactly invariant for max-pooled pointwise
    models: predict_proba at a non-bucket N equals running the model at
    the exact shape."""
    from pointcloudlib_tpu.train.state import init_variables
    import jax.numpy as jnp

    model = get_cls_model("pointnet", n_classes=40)
    rng = np.random.default_rng(1)
    clouds = rng.standard_normal((3, 200, 3)).astype(np.float32)
    variables = init_variables(model, jax.random.key(0),
                               jnp.asarray(clouds[:1]), None)
    p = Predictor(model, variables, with_normals=False, batch_size=4)
    got = p.predict_proba(clouds)  # pads 200 -> 256 by repetition
    exact = np.asarray(jax.nn.softmax(
        model.apply(variables, jnp.asarray(clouds), None, training=False),
        axis=-1))
    np.testing.assert_allclose(got, exact, rtol=1e-5, atol=1e-6)


def test_padding_harmless_for_dgcnn():
    """Graph models see only real geometry: repetition padding changes
    the kNN graph only by duplicate edges near the padded points, so
    predictions match the exact-shape run (zero padding would inject
    phantom origin points and break this)."""
    from pointcloudlib_tpu.train.state import init_variables
    import jax.numpy as jnp

    model = get_cls_model("dgcnn", n_classes=40)
    rng = np.random.default_rng(2)
    clouds = rng.standard_normal((2, 250, 3)).astype(np.float32)
    clouds /= np.linalg.norm(clouds, axis=-1, keepdims=True)
    variables = init_variables(model, jax.random.key(0),
                               jnp.asarray(clouds[:1]), None)
    p = Predictor(model, variables, with_normals=False, batch_size=2)
    got = p.predict_proba(clouds)  # pads 250 -> 256 by repetition
    exact = np.asarray(jax.nn.softmax(
        model.apply(variables, jnp.asarray(clouds), None, training=False),
        axis=-1))
    assert (got.argmax(-1) == exact.argmax(-1)).all()
    np.testing.assert_allclose(got, exact, rtol=0.05, atol=0.02)
