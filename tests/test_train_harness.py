"""Train-harness tests: losses, schedules, config I/O, checkpointing,
and data-parallel equivalence on the virtual 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointcloudlib_tpu.train import (
    soft_cross_entropy,
    sgd_momentum,
    step_decay,
    create_train_state,
    make_cls_train_step,
)
from pointcloudlib_tpu.utils.config import load_config, save_config


class TestSoftCrossEntropy:
    def test_matches_manual_reference_formula(self):
        """Reference soft_cross_entropy_loss (train_cls.py:31-50):
        one-hot smoothed to 1-eps / eps/(n-1)."""
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((4, 10)).astype(np.float32)
        labels = np.array([1, 3, 9, 0])
        eps = 0.2
        one_hot = np.eye(10)[labels]
        soft = one_hot * (1 - eps) + (1 - one_hot) * eps / 9
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = -(soft * np.log(p)).sum(-1).mean()
        got = float(soft_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_no_smoothing_is_plain_ce(self):
        logits = jnp.asarray(np.random.default_rng(1).standard_normal((4, 5)),
                             jnp.float32)
        labels = jnp.array([0, 1, 2, 3])
        got = float(soft_cross_entropy(logits, labels, smoothing=False))
        want = float(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestStepDecay:
    def test_reference_formula(self):
        """misc/utils.py:8-19: lr = base * max(0.6^(step//15000), 2e-5)."""
        sched = step_decay(0.1)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(14999)) == pytest.approx(0.1)
        assert float(sched(15000)) == pytest.approx(0.06)
        assert float(sched(45000)) == pytest.approx(0.1 * 0.6**3)
        assert float(sched(10_000_000)) == pytest.approx(0.1 * 2e-5)

    def test_reference_flat_lr(self):
        """The reference CLIs step the scheduler with a constant
        argument (train_cls.py:475, train_partseg.py:86), so the
        effective lr is flat: base * max(0.6^int(n/15000), 2e-5).
        Both shipped datasets sit below one decade."""
        from pointcloudlib_tpu.train import reference_flat_lr

        # ModelNet40: 9840 train clouds, B=32 -> flat base lr
        assert reference_flat_lr(0.02, 9840, 32) == pytest.approx(0.02)
        # ShapeNetPart trainval: 14007, B=16 -> still decade 0
        assert reference_flat_lr(0.01, 14007, 16) == pytest.approx(0.01)
        # a >=15000-sample dataset crosses one decade
        assert reference_flat_lr(0.02, 16000, 32) == pytest.approx(
            0.02 * 0.6
        )
        # the 2e-5 floor engages for absurd sizes
        assert reference_flat_lr(
            0.02, 15000 * 25, 32
        ) == pytest.approx(0.02 * 2e-5)


class TestConfigIO:
    def test_roundtrip(self, tmp_path):
        from pointcloudlib_tpu.models.kpconv import KPConvConfig

        cfg = KPConvConfig(num_classes=13, first_subsampling_dl=0.04)
        path = tmp_path / "parameters.txt"
        save_config(cfg, path)
        loaded = load_config(KPConvConfig, path)
        assert loaded == cfg


def _tiny_setup():
    from pointcloudlib_tpu.models import get_cls_model

    model = get_cls_model("pointnet", n_classes=4)
    rng = np.random.default_rng(0)
    batch = {
        "xyz": rng.standard_normal((8, 32, 3)).astype(np.float32),
        "label": (np.arange(8) % 4).astype(np.int32),
    }
    tx = sgd_momentum(step_decay(0.05), momentum=0.9)
    state = create_train_state(
        model, jax.random.key(0), batch["xyz"][:1], None, tx
    )
    return model, state, batch


class TestDataParallel:
    def test_dp_matches_single_device(self):
        """The 8-way sharded step must produce the same update as the
        unsharded step (XLA's psum == full-batch gradient)."""
        from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch

        model, state0, batch = _tiny_setup()
        key = jax.random.key(42)

        # single-device
        step1 = make_cls_train_step(model, mesh=None)
        s1, m1 = step1(jax.device_put(state0), jax.device_put(batch), key)

        # 8-device mesh
        model2, state2, _ = _tiny_setup()
        mesh = make_mesh(8)
        step8 = make_cls_train_step(model2, mesh)
        s8, m8 = step8(replicate(mesh, state2), shard_batch(mesh, batch), key)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s8.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from pointcloudlib_tpu.utils.checkpoint import CheckpointManager

        _, state, _ = _tiny_setup()
        mgr = CheckpointManager(tmp_path / "ckpt")
        mgr.save(state, step=0, best=True)
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = mgr.restore(zeroed)
        assert restored is not None
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (tmp_path / "ckpt" / "best").exists()


@pytest.mark.parametrize("model_name,n", [("pointcnn", 128),
                                          ("pointconv", 512),
                                          ("dgcnn", 128),
                                          ("pointnet2_msg", 512)])
def test_shard_map_sync_bn_matches_jit_spmd(model_name, n):
    """PointCNN/PointConv under shard_map DP with axis_name: every
    BatchNorm syncs over the mesh axis, so one step equals the
    jit-SPMD step (same contract as pointnet2/dgcnn/kpconv)."""
    import numpy as np

    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
    from pointcloudlib_tpu.train import (
        create_train_state, make_cls_train_step, sgd_momentum, step_decay,
    )

    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    b = 8
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    batch = {"xyz": xyz, "label": (np.arange(b) % 4).astype(np.int32)}
    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.05), momentum=0.9)

    m_ref = get_cls_model(model_name, n_classes=4)
    s_ref = create_train_state(m_ref, key, batch["xyz"][:2], None, tx)
    s_ref = replicate(mesh, s_ref)
    s_ref, met_ref = make_cls_train_step(m_ref, mesh)(
        s_ref, shard_batch(mesh, batch), key)

    m_dp = get_cls_model(model_name, n_classes=4, axis_name="data")
    s_dp = create_train_state(m_dp, key, batch["xyz"][:2], None, tx)
    s_dp = replicate(mesh, s_dp)
    s_dp, met_dp = make_cls_train_step(m_dp, mesh, axis_name="data")(
        s_dp, shard_batch(mesh, batch), key)

    # losses are NOT compared: dropout masks are sampled differently
    # under shard_map (per-shard slice from the same key) vs jit-SPMD
    # (one global mask) — both valid samplings. Sync-BN is judged on
    # the batch statistics of every BN layer upstream of any dropout
    # (pointcnn: all of them; pointconv: the SA/Interp towers — the
    # head's second DenseBNAct sits after a dropout).
    del met_ref, met_dp

    # per-model exclusion of BNs downstream of a dropout (their
    # inputs see the divergent masks); everything else must sync
    def _upstream(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        if model_name == "pointconv":
            return [(k, v) for k, v in flat
                    if str(k[0]).find("PointConvSA") >= 0]
        exclude = {
            "pointcnn": (),
            # cls head: DenseBNAct_1(512) -> drop -> DenseBNAct_2(256)
            "dgcnn": ("DenseBNAct_2",),
            # _ClsHead: DenseBNAct_0 -> drop -> DenseBNAct_1
            "pointnet2_msg": ("_ClsHead",),
        }[model_name]
        return [(k, v) for k, v in flat
                if not any(str(part).find(e) >= 0
                           for part in k for e in exclude)]

    ref = _upstream(s_ref.batch_stats)
    dp = _upstream(s_dp.batch_stats)
    assert ref and len(ref) == len(dp)
    for (ka, a), (kb, b_) in zip(ref, dp):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=str(ka))

