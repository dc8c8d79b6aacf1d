"""Part-segmentation steps under shard_map data parallelism (8-device
CPU mesh) — the seg-side counterpart of tests/test_fused_sa_dp.py /
test_train_harness.py::test_shard_map_sync_bn_matches_jit_spmd.

Three contracts per family:
  * eval: the shard_map eval step (per-shard forward, predictions
    gathered over the axis) equals the single-device predictions;
  * train: one shard_map step with axis_name syncs every BatchNorm
    upstream of any dropout to the jit-SPMD statistics (sync-BN);
  * loss math: with an UNEVEN valid mask across shards, the psum'd
    numerator/denominator loss equals the single-device masked mean
    exactly (make_seg_train_step normalizes by the GLOBAL valid count).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pointcloudlib_tpu.models import SEG_MODELS, dp_kwargs, get_seg_model
from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
from pointcloudlib_tpu.train import (
    make_seg_eval_step,
    make_seg_train_step,
    sgd_momentum,
    step_decay,
)
from pointcloudlib_tpu.train.state import TrainState, init_variables

B, N, PARTS, WORLD = 8, 128, 8, 8


def _batch(seed=0, uneven_valid=False):
    rng = np.random.default_rng(seed)
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    batch = {
        "xyz": xyz,
        "cls_onehot": np.eye(16, dtype=np.float32)[np.arange(B) % 16],
        "seg": rng.integers(0, PARTS, (B, N)).astype(np.int32),
    }
    if uneven_valid:
        # shards 0..3 fully valid, shards 4..7 padded — the global
        # denominator differs from W × any local one
        batch["valid"] = (np.arange(B) < 5)
    return batch


def _state(model, batch, feats=None):
    variables = init_variables(
        model, jax.random.key(0), batch["xyz"], batch["cls_onehot"],
        feats=feats,
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=sgd_momentum(step_decay(0.05), momentum=0.9),
    )


def _feats(name, batch):
    return batch["xyz"] if name.startswith("pointnet2") else None


@pytest.mark.parametrize("name", sorted(SEG_MODELS))
def test_seg_eval_shard_map_matches_single_device(name):
    mesh = make_mesh(WORLD)
    batch = _batch(1)
    feats = _feats(name, batch)
    if feats is not None:
        batch["feats"] = feats

    m1 = get_seg_model(name, part_num=PARTS)
    s1 = _state(m1, batch, feats)
    pred1 = np.asarray(make_seg_eval_step(m1)(s1, batch))

    mdp = get_seg_model(name, part_num=PARTS,
                        **dp_kwargs(SEG_MODELS[name], "data", WORLD))
    # identical init: parameters are axis-independent
    sdp = replicate(mesh, _state(mdp, batch, feats))
    step = make_seg_eval_step(mdp, mesh, axis_name="data")
    pred8 = np.asarray(step(sdp, shard_batch(mesh, batch)))
    # eval is deterministic f32 on CPU: identical per-sample programs
    np.testing.assert_array_equal(pred1, pred8)


# BN modules downstream of a dropout see divergent masks (shard_map
# folds the shard index into the rng; jit-SPMD draws one global mask) —
# excluded from the sync comparison. pointnet has no dropout at all;
# pointnet2/pointconv/pointcnn drop only right before the final Dense.
_EXCLUDE = {
    "pointnet": (),
    "pointnet2": (),
    "pointconv": (),
    "pointcnn": (),
    "dgcnn": ("DenseBNAct_8", "DenseBNAct_9"),
}


@pytest.mark.parametrize("name", sorted(SEG_MODELS))
def test_seg_train_sync_bn_matches_jit_spmd(name):
    mesh = make_mesh(WORLD)
    batch = _batch(2)
    feats = _feats(name, batch)
    if feats is not None:
        batch["feats"] = feats
    key = jax.random.key(7)

    m_ref = get_seg_model(name, part_num=PARTS)
    s_ref = replicate(mesh, _state(m_ref, batch, feats))
    s_ref, _ = make_seg_train_step(m_ref, mesh)(
        s_ref, shard_batch(mesh, batch), key)

    mdp = get_seg_model(name, part_num=PARTS,
                        **dp_kwargs(SEG_MODELS[name], "data", WORLD))
    sdp = replicate(mesh, _state(mdp, batch, feats))
    sdp, _ = make_seg_train_step(mdp, mesh, axis_name="data")(
        sdp, shard_batch(mesh, batch), key)

    def _flat(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return [(k, v) for k, v in flat
                if not any(str(part).find(e) >= 0
                           for part in k for e in _EXCLUDE[name])]

    ref, dp = _flat(s_ref.batch_stats), _flat(sdp.batch_stats)
    assert ref and len(ref) == len(dp)
    for (ka, a), (kb, b) in zip(ref, dp):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(ka))


class _LinearSeg(nn.Module):
    """Dropout-free micro seg model: per-point Dense. Isolates the
    masked-loss math from model stochasticity."""

    part_num: int = PARTS

    @nn.compact
    def __call__(self, xyz, cls_label, feats=None, training=False):
        del cls_label, feats, training
        return nn.Dense(self.part_num)(xyz)


def test_seg_masked_loss_exact_global_weighting():
    """Uneven valid masks across shards: shard_map loss/acc/grads must
    equal the single-device masked values exactly (psum'd numerators
    over a GLOBAL denominator — pmean of local means would be wrong
    here, since shards 4..7 carry more padding than 0..3)."""
    mesh = make_mesh(WORLD)
    batch = _batch(3, uneven_valid=True)
    model = _LinearSeg()
    key = jax.random.key(0)

    s1 = _state(model, batch)
    step1 = make_seg_train_step(model)
    s1_out, m1 = step1(s1, batch, key)

    s8 = replicate(mesh, _state(model, batch))
    step8 = make_seg_train_step(model, mesh, axis_name="data")
    s8_out, m8 = step8(s8, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["acc"]), float(m8["acc"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1_out.params),
                    jax.tree_util.tree_leaves(s8_out.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_seg_train_pointnet_loss_matches_spmd():
    """PointNet seg has NO dropout: the full loss (not just the batch
    stats) of the shard_map step must match jit-SPMD."""
    mesh = make_mesh(WORLD)
    batch = _batch(4)
    key = jax.random.key(1)

    m_ref = get_seg_model("pointnet", part_num=PARTS)
    s_ref = replicate(mesh, _state(m_ref, batch))
    _, met_ref = make_seg_train_step(m_ref, mesh)(
        s_ref, shard_batch(mesh, batch), key)

    mdp = get_seg_model("pointnet", part_num=PARTS,
                        **dp_kwargs(SEG_MODELS["pointnet"], "data", WORLD))
    sdp = replicate(mesh, _state(mdp, batch))
    _, met_dp = make_seg_train_step(mdp, mesh, axis_name="data")(
        sdp, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(met_ref["loss"]),
                               float(met_dp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(met_ref["acc"]),
                               float(met_dp["acc"]), rtol=1e-5)
