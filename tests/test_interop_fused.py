"""Fused ↔ unfused checkpoint conversion (utils/interop.py).

A model trained on TPU (fused Pallas param layout) must restore on CPU
(unfused XLA layout) and vice versa: convert_variables re-shapes the
tree against a destination-template init; eval outputs must then match
to bf16-rounding tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu.models import get_cls_model
from pointcloudlib_tpu.utils.interop import convert_variables


def _init(model_name, env, xyz, feats):
    os.environ["POINTCLOUDLIB_FUSED_SA"] = env
    try:
        model = get_cls_model(model_name, n_classes=10)
        v = model.init(jax.random.key(0), xyz, feats, True)
        # one train step so batch_stats are non-trivial
        out = model.apply(v, xyz, feats, True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(1)})
        bs = out[1]["batch_stats"]
        return model, {"params": v["params"], "batch_stats": bs}
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]


def _eval(model, v, env, xyz, feats):
    os.environ["POINTCLOUDLIB_FUSED_SA"] = env
    try:
        return np.asarray(model.apply(v, xyz, feats, training=False))
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]


def _check(model_name, with_feats):
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    feats = (jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
             if with_feats else None)

    fused_model, fused_v = _init(model_name, "1", xyz, feats)
    unfused_model, unfused_tmpl = _init(model_name, "0", xyz, feats)

    # fused checkpoint → unfused backend
    conv = convert_variables(fused_v, unfused_tmpl)
    a = _eval(fused_model, fused_v, "1", xyz, feats)
    b = _eval(unfused_model, conv, "0", xyz, feats)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)

    # and back: unfused → fused → identical tree values
    back = convert_variables(conv, fused_v)
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(fused_v)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def test_pointnet2_fused_checkpoint_restores_unfused():
    _check("pointnet2", with_feats=True)


def test_dgcnn_fused_checkpoint_restores_unfused():
    _check("dgcnn", with_feats=False)


def test_msg_fused_checkpoint_restores_unfused():
    _check("pointnet2_msg", with_feats=True)


def test_dgcnn_partseg_fused_checkpoint_restores_unfused():
    """The partseg pair layers (Fused2EdgeConv) pack two DenseBNActs
    and shift the head numbering by 5 — the dedicated level mapper
    round-trips the tree exactly and eval outputs match."""
    from pointcloudlib_tpu.models import get_seg_model

    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    lab = jnp.asarray(np.eye(16, dtype=np.float32)[[0, 5]])

    def init(env):
        os.environ["POINTCLOUDLIB_FUSED_SA"] = env
        try:
            model = get_seg_model("dgcnn", part_num=50, k=8)
            v = model.init(jax.random.key(0), xyz, lab, None, True)
            out = model.apply(v, xyz, lab, None, True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.key(1)})
            return model, {"params": v["params"],
                           "batch_stats": out[1]["batch_stats"]}
        finally:
            del os.environ["POINTCLOUDLIB_FUSED_SA"]

    def ev(model, v, env):
        os.environ["POINTCLOUDLIB_FUSED_SA"] = env
        try:
            return np.asarray(
                model.apply(v, xyz, lab, None, training=False))
        finally:
            del os.environ["POINTCLOUDLIB_FUSED_SA"]

    fused_model, fused_v = init("1")
    unfused_model, unfused_tmpl = init("0")

    conv = convert_variables(fused_v, unfused_tmpl)
    a = ev(fused_model, fused_v, "1")
    b = ev(unfused_model, conv, "0")
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)

    back = convert_variables(conv, fused_v)
    for (pa, la), (_, lb) in zip(
        jax.tree_util.tree_flatten_with_path(fused_v)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))
