"""Golden-shape + trainability tests for classification models
(SURVEY.md §4 test pyramid, tiers (b) and (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointcloudlib_tpu.models import CLS_MODELS, get_cls_model

B, N = 2, 128


def _init_and_apply(name, with_normals):
    model = get_cls_model(name, n_classes=40)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = (
        jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
        if with_normals
        else None
    )
    variables = model.init(jax.random.key(0), xyz, feats, training=False)
    return model, variables, xyz, feats


@pytest.mark.parametrize("name", sorted(CLS_MODELS))
def test_forward_shape(name):
    model, variables, xyz, feats = _init_and_apply(
        name, with_normals=name.startswith("pointnet2")
    )
    logits = model.apply(variables, xyz, feats, training=False)
    assert logits.shape == (B, 40)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", sorted(CLS_MODELS))
def test_train_mode_updates_batch_stats(name):
    model, variables, xyz, feats = _init_and_apply(
        name, with_normals=name.startswith("pointnet2")
    )
    logits, mutated = model.apply(
        variables, xyz, feats, training=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)},
    )
    assert logits.shape == (B, 40)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    ), "running stats must move in training mode"


def test_pointnet_overfits_tiny_batch():
    """Tier-(c) sanity: a few SGD steps must drive loss down on 4 clouds."""
    model = get_cls_model("pointnet", n_classes=4)
    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
    labels = jnp.arange(4)
    variables = model.init(jax.random.key(0), xyz, None, training=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                xyz, None, training=True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    first = None
    for i in range(30):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5, (first, float(loss))
