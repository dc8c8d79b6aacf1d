"""Fused EdgeConv (Pallas) vs the unfused DGCNN path.

Same test strategy as test_fused_sa: forward/stat/eval parity against
the unfused module (bf16-rounding tolerances), a tight VJP oracle
against jax AD of a rounding-identical jnp replica, and gradient
direction/magnitude parity.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointcloudlib_tpu.models.dgcnn import EdgeConv, FusedEdgeConv
from pointcloudlib_tpu.ops.pallas.fused_edge import (
    EdgeStats,
    fused_edge_conv,
    fused_edge_eval,
)

B, N, K, C, F = 2, 64, 8, 16, 32


def _x(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)


def _init_both(x):
    fused = FusedEdgeConv(F, K)
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "0"
    try:
        unfused = EdgeConv(F, K)
        uv = unfused.init(jax.random.key(0), x, True)
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]
    fv = fused.init(jax.random.key(0), x, True)
    # copy fused weights into the unfused tree
    up = uv["params"]["DenseBNAct_0"]
    up["Dense_0"]["kernel"] = fv["params"]["w"]
    up["BatchNorm_0"]["scale"] = fv["params"]["bn_scale"]
    up["BatchNorm_0"]["bias"] = fv["params"]["bn_bias"]
    return fused, unfused, fv, uv


def test_forward_and_stats_parity():
    x = _x(0)
    fused, unfused, fv, uv = _init_both(x)
    (fo), fmut = fused.apply(fv, x, True, mutable=["batch_stats"])
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "0"
    try:
        uo, umut = unfused.apply(uv, x, True, mutable=["batch_stats"])
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]
    np.testing.assert_allclose(np.asarray(fo), np.asarray(uo),
                               rtol=0.05, atol=0.05)
    ubn = umut["batch_stats"]["DenseBNAct_0"]["BatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(fmut["batch_stats"]["mean"]), np.asarray(ubn["mean"]),
        rtol=0.03, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(fmut["batch_stats"]["var"]), np.asarray(ubn["var"]),
        rtol=0.05, atol=0.02)


def test_eval_parity():
    x = _x(1)
    fused, unfused, fv, uv = _init_both(x)
    _, fmut = fused.apply(fv, x, True, mutable=["batch_stats"])
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "0"
    try:
        _, umut = unfused.apply(uv, x, True, mutable=["batch_stats"])
        uo = unfused.apply(
            {"params": uv["params"], **umut}, x, False)
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]
    fo = fused.apply({"params": fv["params"], **fmut}, x, False)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(uo),
                               rtol=0.05, atol=0.05)


def _edge_reference(q, off, idx, gamma, beta, slope=0.2):
    """jnp replica with the kernels' exact roundings."""
    b, n, c = q.shape
    _, m, k = idx.shape

    def bf(v):
        return v.astype(jnp.bfloat16).astype(jnp.float32)

    g = jnp.take_along_axis(
        bf(q), idx.reshape(b, m * k)[..., None], axis=1
    ).reshape(b, m, k, c)
    h = g - off[:, :, None, :]
    flat = h.reshape(-1, c)
    mean = jnp.mean(flat, axis=0)
    var = jnp.maximum(jnp.mean(flat * flat, axis=0) - mean ** 2, 0.0)
    hc = bf(h)  # the bf16 checkpoint
    z = gamma * (hc - mean) * jax.lax.rsqrt(var + 1e-5) + beta
    y = jnp.where(z > 0, z, slope * z)
    return jnp.max(y, axis=2), (mean, var)


def test_vjp_matches_jax_ad_of_replica():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, N, F)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, N, F)) * .1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    gamma = jnp.asarray(1 + .1 * rng.standard_normal(F), jnp.float32)
    beta = jnp.asarray(.1 * rng.standard_normal(F), jnp.float32)
    co = jnp.asarray(rng.standard_normal((B, N, F)), jnp.float32)

    def loss_f(q, off, gamma, beta):
        out, _ = fused_edge_conv(q, off, idx, gamma, beta, 0.2, True)
        return jnp.sum(out * co)

    def loss_r(q, off, gamma, beta):
        out, _ = _edge_reference(q, off, idx, gamma, beta)
        return jnp.sum(out * co)

    np.testing.assert_allclose(float(loss_f(q, off, gamma, beta)),
                               float(loss_r(q, off, gamma, beta)),
                               rtol=2e-3)
    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(q, off, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, off, gamma, beta)
    for a, b in zip(gf, gr):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-4)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.03, atol=0.03 * scale)


def test_dgcnn_model_fused_runs_and_learns():
    """The full DGCNN cls model with the fused path enabled trains."""
    import optax

    from pointcloudlib_tpu.models.dgcnn import DGCNN

    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    try:
        rng = np.random.default_rng(5)
        xyz = jnp.asarray(rng.standard_normal((4, 64, 3)), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
        model = DGCNN(n_classes=4, k=8)
        v = model.init(jax.random.key(0), xyz, training=True)
        tx = optax.adam(1e-3)
        opt = tx.init(v["params"])

        @jax.jit
        def step(params, bs, opt):
            def lf(p):
                logits, mut = model.apply(
                    {"params": p, "batch_stats": bs}, xyz, training=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.key(1)})
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean(), mut["batch_stats"]

            (l, bs2), g = jax.value_and_grad(lf, has_aux=True)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), bs2, opt, l

        params, bs = v["params"], v["batch_stats"]
        first = None
        for _ in range(25):
            params, bs, opt, l = step(params, bs, opt)
            if first is None:
                first = float(l)
        assert float(l) < first * 0.6, (first, float(l))
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]


def _edge2_reference(q, off, idx, w2, g1, b1, g2, b2, slope=0.2):
    """jnp replica of the two-layer fused EdgeConv with the kernels'
    exact roundings."""
    b, n, c = q.shape
    _, m, k = idx.shape

    def bf(v):
        return v.astype(jnp.bfloat16).astype(jnp.float32)

    g = jnp.take_along_axis(
        bf(q), idx.reshape(b, m * k)[..., None], axis=1
    ).reshape(b, m, k, c)
    h1 = g - off[:, :, None, :]

    def moments(h):
        flat = h.reshape(-1, h.shape[-1])
        mean = jnp.mean(flat, axis=0)
        var = jnp.maximum(jnp.mean(flat * flat, axis=0) - mean ** 2, 0.)
        return mean, var

    def bn_leaky(hc, stats, gam, bet):
        mean, var = stats
        z = gam * (hc - mean) * jax.lax.rsqrt(var + 1e-5) + bet
        return jnp.where(z > 0, z, slope * z)

    s1 = moments(h1)
    y1 = bn_leaky(bf(h1), s1, g1, b1)
    h2 = jnp.einsum("bmkc,cd->bmkd", y1.astype(jnp.bfloat16),
                    w2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    s2 = moments(h2)
    y2 = bn_leaky(h2, s2, g2, b2)
    return jnp.max(y2, axis=2), (s1, s2)


def test_edge2_vjp_matches_jax_ad_of_replica():
    from pointcloudlib_tpu.ops.pallas.fused_edge import fused_edge2_conv

    rng = np.random.default_rng(6)
    f1, f2 = 16, 32
    q = jnp.asarray(rng.standard_normal((B, N, f1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, N, f1)) * .1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, K)), jnp.int32)
    w2 = jnp.asarray(rng.standard_normal((f1, f2)) * .3, jnp.float32)
    g1 = jnp.asarray(1 + .1 * rng.standard_normal(f1), jnp.float32)
    b1 = jnp.asarray(.1 * rng.standard_normal(f1), jnp.float32)
    g2 = jnp.asarray(1 + .1 * rng.standard_normal(f2), jnp.float32)
    b2 = jnp.asarray(.1 * rng.standard_normal(f2), jnp.float32)
    co = jnp.asarray(rng.standard_normal((B, N, f2)), jnp.float32)

    def loss_f(q, off, w2, g1, b1, g2, b2):
        out, _ = fused_edge2_conv(q, off, idx, w2, g1, b1, g2, b2,
                                  0.2, True)
        return jnp.sum(out * co)

    def loss_r(q, off, w2, g1, b1, g2, b2):
        out, _ = _edge2_reference(q, off, idx, w2, g1, b1, g2, b2)
        return jnp.sum(out * co)

    args = (q, off, w2, g1, b1, g2, b2)
    np.testing.assert_allclose(float(loss_f(*args)), float(loss_r(*args)),
                               rtol=2e-3)
    gf = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-4)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.04, atol=0.04 * scale,
            err_msg=f"arg {i}")


def test_dgcnn_partseg_fused_runs():
    from pointcloudlib_tpu.models.dgcnn import DGCNNPartSeg

    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    try:
        rng = np.random.default_rng(7)
        xyz = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
        onehot = jnp.eye(16, dtype=jnp.float32)[jnp.asarray([0, 1])]
        model = DGCNNPartSeg(part_num=10, k=8)
        v = model.init(jax.random.key(0), xyz, onehot, training=True)
        out, mut = model.apply(v, xyz, onehot, training=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.key(1)})
        assert out.shape == (2, 64, 10)
        assert np.isfinite(np.asarray(out)).all()
        # grads flow
        g = jax.grad(lambda p: jnp.sum(model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, xyz, onehot,
            training=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})[0] ** 2))(v["params"])
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]


def test_knn_fused_matches_separate():
    """fused_edge_conv_knn (graph built inside the gather kernel) must
    equal knn + fused_edge_conv in outputs, stats, and gradients."""
    from pointcloudlib_tpu.ops import knn
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        fused_edge_conv_knn,
    )

    rng = np.random.default_rng(3)
    b, n, k, c, f = 2, 128, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((c, f)) * 0.3, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((c, f)) * 0.3, jnp.float32)
    gamma = jnp.ones((f,))
    beta = jnp.zeros((f,))
    q = jnp.dot(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    off = jnp.dot(x.astype(jnp.bfloat16), (wa - wb).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    def run_sep(q, off, gamma, beta):
        _, idx = knn(x, x, k)
        out, stats = fused_edge_conv(q, off, idx, gamma, beta, 0.2,
                                     True, None, 1)
        return jnp.sum(out * out), (out, stats)

    def run_knn(q, off, gamma, beta):
        out, stats = fused_edge_conv_knn(x, q, off, gamma, beta, k,
                                         0.2, True, None, 1)
        return jnp.sum(out * out), (out, stats)

    (l0, (o0, s0)), g0 = jax.value_and_grad(
        run_sep, argnums=(0, 1, 2, 3), has_aux=True)(q, off, gamma, beta)
    (l1, (o1, s1)), g1 = jax.value_and_grad(
        run_knn, argnums=(0, 1, 2, 3), has_aux=True)(q, off, gamma, beta)

    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves((s0, g0)),
                     jax.tree_util.tree_leaves((s1, g1))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def _mostly_close(a, b, rtol=2e-4, atol=1e-5, frac=1e-2, max_abs=0.05):
    """Tight allclose on >(1-frac) of elements; the rest bounded by
    max_abs (kNN distance-tie flips perturb isolated rows; a real
    accumulator bug perturbs ~every element by O(1), far past both
    bounds)."""
    a, b = np.asarray(a), np.asarray(b)
    bad = ~np.isclose(a, b, rtol=rtol, atol=atol)
    assert bad.mean() <= frac, (bad.mean(), frac)
    if bad.any():
        assert np.abs(a - b)[bad].max() <= max_abs


def test_knn_fused_multitile_matches_separate():
    """Multi-tile regression for the psum re-zeroing bug: at
    n=512/f=256 the _call_eknn_f1 budget math gives mt=256 → nt=2, so
    the BN-sum accumulator must survive across query tiles (the round-1
    2-D grid version re-zeroed it on every batch-0 tile, corrupting the
    train-mode statistics at every production DGCNN shape)."""
    from pointcloudlib_tpu.ops import knn
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        fused_edge_conv_knn, fused_edge_eval_knn,
    )

    rng = np.random.default_rng(11)
    b, n, k, c, f = 2, 512, 8, 16, 256
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((c, f)) * 0.3, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((c, f)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    q = jnp.dot(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    off = jnp.dot(x.astype(jnp.bfloat16), (wa - wb).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    # confirm the shape really is multi-tile, or the test is vacuous
    from pointcloudlib_tpu.ops.pallas.fused_sa import _block_tile
    per_row = 2 * (k * f * 2 + k * 4 + f * 4) + n * 4
    budget = (5 << 20) - 4 * n * (c + f)
    assert n // _block_tile(n, max(8, budget // per_row)) > 1

    def run_sep(q, off, gamma, beta):
        _, idx = knn(x, x, k)
        out, stats = fused_edge_conv(q, off, idx, gamma, beta, 0.2,
                                     True, None, 1)
        return jnp.sum(out * out), (out, stats)

    def run_knn(q, off, gamma, beta):
        out, stats = fused_edge_conv_knn(x, q, off, gamma, beta, k,
                                         0.2, True, None, 1)
        return jnp.sum(out * out), (out, stats)

    (_, (o0, s0)), g0 = jax.value_and_grad(
        run_sep, argnums=(0, 1, 2, 3), has_aux=True)(q, off, gamma, beta)
    (_, (o1, s1)), g1 = jax.value_and_grad(
        run_knn, argnums=(0, 1, 2, 3), has_aux=True)(q, off, gamma, beta)
    # at this shape the two paths compute d2 with different f32
    # reduction orders; a near-equidistant k-th neighbor can flip,
    # perturbing a handful of rows — require tight agreement on
    # >99.9% of elements with small bounded outliers
    _mostly_close(o0, o1, rtol=1e-5, atol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves((s0, g0)),
                     jax.tree_util.tree_leaves((s1, g1))):
        _mostly_close(a, b_)

    # eval variant at the same multi-tile shape
    stats = EdgeStats(
        jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2.0, (f,)), jnp.float32))
    _, idx = knn(x, x, k)
    want = fused_edge_eval(q, off, idx, gamma, beta, stats, 0.2, True)
    got = fused_edge_eval_knn(x, q, off, gamma, beta, stats, k, 0.2,
                              True)
    _mostly_close(got, want, rtol=1e-5, atol=1e-5)


def test_knn_fused_edge2_multitile_matches_separate():
    """Two-layer variant at a forced-multi-tile shape (same regression
    class as test_knn_fused_multitile_matches_separate)."""
    from pointcloudlib_tpu.ops import knn
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        fused_edge2_conv, fused_edge2_conv_knn,
    )

    rng = np.random.default_rng(12)
    b, n, k, c, f1, f2 = 2, 512, 8, 12, 256, 64
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((c, f1)) * 0.3, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((c, f1)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f1, f2)) * 0.3, jnp.float32)
    g1, b1 = jnp.ones((f1,)), jnp.zeros((f1,))
    g2, b2 = jnp.ones((f2,)), jnp.zeros((f2,))
    q = jnp.dot(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    off = jnp.dot(x.astype(jnp.bfloat16), (wa - wb).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    def run_sep(q, off, w2, g1, b1, g2, b2):
        _, idx = knn(x, x, k)
        out, stats = fused_edge2_conv(q, off, idx, w2, g1, b1, g2, b2,
                                      0.2, True, None, 1)
        return jnp.sum(out * out), (out, stats)

    def run_knn(q, off, w2, g1, b1, g2, b2):
        out, stats = fused_edge2_conv_knn(x, q, off, w2, g1, b1, g2,
                                          b2, k, 0.2, True, None, 1)
        return jnp.sum(out * out), (out, stats)

    args = (q, off, w2, g1, b1, g2, b2)
    (_, (o0, s0)), g0 = jax.value_and_grad(
        run_sep, argnums=tuple(range(7)), has_aux=True)(*args)
    (_, (o1, s1)), g1_ = jax.value_and_grad(
        run_knn, argnums=tuple(range(7)), has_aux=True)(*args)
    _mostly_close(o0, o1, rtol=1e-5, atol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves((s0, g0)),
                     jax.tree_util.tree_leaves((s1, g1_))):
        _mostly_close(a, b_, rtol=1e-3, atol=1e-3)


def test_knn_fused_eval_matches_separate():
    from pointcloudlib_tpu.ops import knn
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        fused_edge_eval, fused_edge_eval_knn,
    )

    rng = np.random.default_rng(4)
    b, n, k, c, f = 2, 128, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((c, f)) * 0.3, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((c, f)) * 0.3, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (f,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    stats = EdgeStats(
        jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2.0, (f,)), jnp.float32))
    q = jnp.dot(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    off = jnp.dot(x.astype(jnp.bfloat16), (wa - wb).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    _, idx = knn(x, x, k)
    want = fused_edge_eval(q, off, idx, gamma, beta, stats, 0.2, True)
    got = fused_edge_eval_knn(x, q, off, gamma, beta, stats, k, 0.2,
                              True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_knn_fused_edge2_matches_separate():
    from pointcloudlib_tpu.ops import knn
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        Edge2Stats, fused_edge2_conv, fused_edge2_conv_knn,
        fused_edge2_eval, fused_edge2_eval_knn,
    )

    rng = np.random.default_rng(5)
    b, n, k, c, f1, f2 = 2, 128, 8, 12, 16, 32
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    wa = jnp.asarray(rng.standard_normal((c, f1)) * 0.3, jnp.float32)
    wb = jnp.asarray(rng.standard_normal((c, f1)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f1, f2)) * 0.3, jnp.float32)
    g1, b1 = jnp.ones((f1,)), jnp.zeros((f1,))
    g2, b2 = jnp.ones((f2,)), jnp.zeros((f2,))
    q = jnp.dot(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    off = jnp.dot(x.astype(jnp.bfloat16), (wa - wb).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)

    def run_sep(q, off, w2, g1, b1, g2, b2):
        _, idx = knn(x, x, k)
        out, stats = fused_edge2_conv(q, off, idx, w2, g1, b1, g2, b2,
                                      0.2, True, None, 1)
        return jnp.sum(out * out), (out, stats)

    def run_knn(q, off, w2, g1, b1, g2, b2):
        out, stats = fused_edge2_conv_knn(x, q, off, w2, g1, b1, g2,
                                          b2, k, 0.2, True, None, 1)
        return jnp.sum(out * out), (out, stats)

    args = (q, off, w2, g1, b1, g2, b2)
    (l0, (o0, s0)), g0 = jax.value_and_grad(
        run_sep, argnums=tuple(range(7)), has_aux=True)(*args)
    (l1, (o1, s1)), g1_ = jax.value_and_grad(
        run_knn, argnums=tuple(range(7)), has_aux=True)(*args)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
    # the two paths accumulate the same products in different MXU
    # shapes; bf16 h1 rounding can flip a max-pool tie at the boundary
    for a, b_ in zip(jax.tree_util.tree_leaves((s0, g0)),
                     jax.tree_util.tree_leaves((s1, g1_))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)

    # eval parity
    stats = Edge2Stats(
        jnp.asarray(rng.standard_normal((f1,)) * 0.1, jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2.0, (f1,)), jnp.float32),
        jnp.asarray(rng.standard_normal((f2,)) * 0.1, jnp.float32),
        jnp.asarray(rng.uniform(0.5, 2.0, (f2,)), jnp.float32))
    _, idx = knn(x, x, k)
    want = fused_edge2_eval(q, off, idx, w2, g1, b1, g2, b2, stats,
                            0.2, True)
    got = fused_edge2_eval_knn(x, q, off, w2, g1, b1, g2, b2, stats,
                               k, 0.2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
