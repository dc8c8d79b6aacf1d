"""Fused SA Pallas path vs the unfused XLA path.

The fused kernel chain (ops/pallas/fused_sa.py) must reproduce the
unfused SetAbstraction (gather → Dense → BN → ReLU ×3 → max) — same BN
batch statistics, same gradients. Differences come only from the bf16
layer checkpoints and the recentering reassociation
((a−c)·W vs a·W − c·W in bf16), both ~1e-2 relative.

Runs in interpret mode on the CPU mesh; compiled-vs-interpret parity on
the real chip is checked via the verify skill.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pointcloudlib_tpu.nn.layers import FusedSetAbstraction, SetAbstraction

B, N, M, K = 2, 128, 32, 16
MLP = (16, 16, 32)


def _data(seed=0, feats_ch=3):
    rng = np.random.default_rng(seed)
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    feats = rng.standard_normal((B, N, feats_ch)).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(feats)


def _modules():
    fused = FusedSetAbstraction(mlp=MLP, n_points=M, radius=0.4,
                                n_samples=K)
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "0"
    try:
        unfused = SetAbstraction(mlp=MLP, n_points=M, radius=0.4,
                                 n_samples=K)
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]
    return fused, unfused


def _init_both(xyz, feats):
    """Init the fused module, copy its weights into the unfused tree."""
    fused, unfused = _modules()
    fv = fused.init(jax.random.key(0), xyz, feats, True)
    uv = jax.tree_util.tree_map(lambda x: x,
                                unfused.init(jax.random.key(0), xyz,
                                             feats, True))
    fp = fv["params"]
    up = uv["params"]["PointMLP_0"]
    for i, (wname, sname, bname) in enumerate(
        [("w1", "bn1_scale", "bn1_bias"),
         ("w2", "bn2_scale", "bn2_bias"),
         ("w3", "bn3_scale", "bn3_bias")]
    ):
        blk = up[f"DenseBNAct_{i}"]
        blk["Dense_0"]["kernel"] = fp[wname]
        blk["BatchNorm_0"]["scale"] = fp[sname]
        blk["BatchNorm_0"]["bias"] = fp[bname]
    return fused, unfused, fv, uv


def _apply(module, variables, xyz, feats, training):
    if training:
        (nx, out), mut = module.apply(
            variables, xyz, feats, True, mutable=["batch_stats"])
        return nx, out, mut["batch_stats"]
    nx, out = module.apply(variables, xyz, feats, False)
    return nx, out, None


def test_forward_train_parity():
    xyz, feats = _data()
    fused, unfused, fv, uv = _init_both(xyz, feats)
    _, fo, fbs = _apply(fused, fv, xyz, feats, True)
    _, uo, ubs = _apply(unfused, uv, xyz, feats, True)
    del fbs, ubs  # running updates compared in test_batch_stats_values
    np.testing.assert_allclose(np.asarray(fo), np.asarray(uo),
                               rtol=0.05, atol=0.05)


def test_batch_stats_values_match():
    """The per-layer batch mean/var the fused path computes equals the
    unfused BatchNorm's (first update from init: ra = 0.9·init+0.1·batch,
    so batch stats are recoverable exactly)."""
    xyz, feats = _data(1)
    fused, unfused, fv, uv = _init_both(xyz, feats)
    _, _, fbs = _apply(fused, fv, xyz, feats, True)
    _, _, ubs = _apply(unfused, uv, xyz, feats, True)
    fstats = fbs["FusedSetAbstraction_0"] if "FusedSetAbstraction_0" in fbs \
        else fbs
    um = ubs["PointMLP_0"]
    for i, l in enumerate((1, 2, 3)):
        ubn = um[f"DenseBNAct_{i}"]["BatchNorm_0"]
        np.testing.assert_allclose(
            np.asarray(fstats[f"mean{l}"]), np.asarray(ubn["mean"]),
            rtol=0.03, atol=0.02,
        )
        np.testing.assert_allclose(
            np.asarray(fstats[f"var{l}"]), np.asarray(ubn["var"]),
            rtol=0.05, atol=0.02,
        )


def test_forward_eval_parity():
    """After one train step (same running stats), eval outputs match."""
    xyz, feats = _data(2)
    fused, unfused, fv, uv = _init_both(xyz, feats)
    _, _, fbs = _apply(fused, fv, xyz, feats, True)
    _, _, ubs = _apply(unfused, uv, xyz, feats, True)
    fv2 = {"params": fv["params"], "batch_stats": fbs}
    uv2 = {"params": uv["params"], "batch_stats": ubs}
    _, fo, _ = _apply(fused, fv2, xyz, feats, False)
    _, uo, _ = _apply(unfused, uv2, xyz, feats, False)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(uo),
                               rtol=0.05, atol=0.05)


def test_vjp_matches_jax_ad_of_replica():
    """The hand-written multi-pass VJP equals jax AD of the pure-jnp
    replica that performs the identical roundings — the tight oracle
    (remaining diff: the backward kernels' bf16 matmul inputs, which
    the replica's AD keeps in f32)."""
    from pointcloudlib_tpu.ops.pallas.fused_sa import (
        SAParams,
        fused_sa_reference,
        fused_sa_train,
    )

    rng = np.random.default_rng(7)
    b, n, m, k = 2, 64, 16, 8
    c1, c2, c3 = 16, 16, 32
    q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, m, c1)) * 0.1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
    params = SAParams(
        w2=jnp.asarray(rng.standard_normal((c1, c2)) * 0.3, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((c2, c3)) * 0.3, jnp.float32),
        g1=jnp.asarray(1 + 0.1 * rng.standard_normal(c1), jnp.float32),
        b1=jnp.asarray(0.1 * rng.standard_normal(c1), jnp.float32),
        g2=jnp.asarray(1 + 0.1 * rng.standard_normal(c2), jnp.float32),
        b2=jnp.asarray(0.1 * rng.standard_normal(c2), jnp.float32),
        g3=jnp.asarray(1 + 0.1 * rng.standard_normal(c3), jnp.float32),
        b3=jnp.asarray(0.1 * rng.standard_normal(c3), jnp.float32),
    )
    co = jnp.asarray(rng.standard_normal((b, m, c3)), jnp.float32)

    def loss_fused(q, off, params):
        out, _ = fused_sa_train(q, off, idx, params, True)
        return jnp.sum(out * co)

    def loss_ref(q, off, params):
        out, _ = fused_sa_reference(q, off, idx, params)
        return jnp.sum(out * co)

    of = loss_fused(q, off, params)
    orf = loss_ref(q, off, params)
    np.testing.assert_allclose(float(of), float(orf), rtol=2e-3)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, off, params)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, off, params)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    for a, b_ in zip(flat_f, flat_r):
        scale = max(float(jnp.max(jnp.abs(b_))), 1e-4)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=0.03, atol=0.03 * scale)


def _cos(a, b):
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(a @ b / max(na * nb, 1e-12)), na, nb


def test_gradient_parity_vs_unfused():
    """Fused vs unfused gradients: direction and magnitude agree. Exact
    elementwise equality is impossible — bf16 layer checkpoints create
    max-pool ties the f32 path doesn't have, so gradient redistributes
    among near-tied neighbors (a different, equally valid subgradient)."""
    xyz, feats = _data(3)
    fused, unfused, fv, uv = _init_both(xyz, feats)

    def loss(module, variables, params, x, f):
        v = {"params": params, **{k: variables[k]
                                  for k in variables if k != "params"}}
        (_, out), _ = module.apply(v, x, f, True,
                                   mutable=["batch_stats"])
        return jnp.sum(out * out)

    fg = jax.grad(lambda p, x, f: loss(fused, fv, p, x, f),
                  argnums=(0, 1, 2))(fv["params"], xyz, feats)
    ug = jax.grad(lambda p, x, f: loss(unfused, uv, p, x, f),
                  argnums=(0, 1, 2))(uv["params"], xyz, feats)

    fgp, ugp = fg[0], ug[0]["PointMLP_0"]
    pairs = {
        "w1": (fgp["w1"], ugp["DenseBNAct_0"]["Dense_0"]["kernel"]),
        "w2": (fgp["w2"], ugp["DenseBNAct_1"]["Dense_0"]["kernel"]),
        "w3": (fgp["w3"], ugp["DenseBNAct_2"]["Dense_0"]["kernel"]),
        "g1": (fgp["bn1_scale"],
               ugp["DenseBNAct_0"]["BatchNorm_0"]["scale"]),
        "g2": (fgp["bn2_scale"],
               ugp["DenseBNAct_1"]["BatchNorm_0"]["scale"]),
        "g3": (fgp["bn3_scale"],
               ugp["DenseBNAct_2"]["BatchNorm_0"]["scale"]),
        "b1": (fgp["bn1_bias"],
               ugp["DenseBNAct_0"]["BatchNorm_0"]["bias"]),
        "b2": (fgp["bn2_bias"],
               ugp["DenseBNAct_1"]["BatchNorm_0"]["bias"]),
        "b3": (fgp["bn3_bias"],
               ugp["DenseBNAct_2"]["BatchNorm_0"]["bias"]),
        "dxyz": (fg[1], ug[1]),
        "dfeats": (fg[2], ug[2]),
    }
    for name, (a, b) in pairs.items():
        cos, na, nb = _cos(a, b)
        assert cos > 0.99, (name, cos)
        assert 0.9 < na / max(nb, 1e-12) < 1.1, (name, na, nb)


def test_no_feats_and_no_xyz_variants():
    xyz, feats = _data(4)
    for use_xyz, f in [(True, None), (False, feats)]:
        fused = FusedSetAbstraction(mlp=MLP, n_points=M, radius=0.4,
                                    n_samples=K, use_xyz=use_xyz)
        os.environ["POINTCLOUDLIB_FUSED_SA"] = "0"
        try:
            unfused = SetAbstraction(mlp=MLP, n_points=M, radius=0.4,
                                     n_samples=K, use_xyz=use_xyz)
        finally:
            del os.environ["POINTCLOUDLIB_FUSED_SA"]
        fv = fused.init(jax.random.key(0), xyz, f, True)
        uv = unfused.init(jax.random.key(0), xyz, f, True)
        up = uv["params"]["PointMLP_0"]
        fp = fv["params"]
        for i, w in enumerate(("w1", "w2", "w3")):
            up[f"DenseBNAct_{i}"]["Dense_0"]["kernel"] = fp[w]
        (_, fo), _ = fused.apply(fv, xyz, f, True, mutable=["batch_stats"])
        (_, uo), _ = unfused.apply(uv, xyz, f, True,
                                   mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(fo), np.asarray(uo),
                                   rtol=0.06, atol=0.1)


def test_training_learns():
    """A tiny fused-SA classifier overfits a 2-class toy set."""
    import optax

    xyz, _ = _data(5)
    labels = jnp.asarray([0, 1], jnp.int32)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            _, f = FusedSetAbstraction(mlp=MLP, n_points=M, radius=0.5,
                                       n_samples=K)(x, None, training)
            f = jnp.max(f, axis=1)
            return nn.Dense(2)(f)

    model = Tiny()
    v = model.init(jax.random.key(0), xyz, True)
    tx = optax.adam(3e-3)
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, bs, opt):
        def lf(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": bs}, xyz, True,
                mutable=["batch_stats"])
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return l, mut["batch_stats"]

        (l, bs2), g = jax.value_and_grad(lf, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), bs2, opt, l

    params, bs = v["params"], v["batch_stats"]
    first = None
    for i in range(30):
        params, bs, opt, l = step(params, bs, opt)
        if first is None:
            first = float(l)
    assert float(l) < first * 0.5, (first, float(l))


def test_pointnet2_model_fused_runs_and_learns():
    """The full PointNet++ SSG model with the fused path enabled
    (interpret mode) trains end to end — SA1/SA2 fused, SA3 group-all
    unfused, head unchanged."""
    import optax

    from pointcloudlib_tpu.models import get_cls_model

    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    try:
        rng = np.random.default_rng(9)
        xyz = jnp.asarray(rng.standard_normal((4, 128, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((4, 128, 3)), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
        model = get_cls_model("pointnet2", n_classes=4)
        v = model.init(jax.random.key(0), xyz, feats, True)
        flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        assert any("FusedSetAbstraction" in jax.tree_util.keystr(kp)
                   for kp, _ in flat), "fused path not active"
        tx = optax.adam(1e-3)
        opt = tx.init(v["params"])

        @jax.jit
        def step(params, bs, opt):
            def lf(p):
                logits, mut = model.apply(
                    {"params": p, "batch_stats": bs}, xyz, feats,
                    training=True, mutable=["batch_stats"],
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


def test_msg_fused_matches_unfused():
    """SetAbstractionMSG's fused path equals the unfused one (weights
    copied scale by scale)."""
    from pointcloudlib_tpu.nn.layers import SetAbstractionMSG

    xyz, feats = _data(11)
    kw = dict(n_points=M, radii=[0.3, 0.6], n_samples=[8, 16],
              mlps=[[16, 16, 32], [16, 16, 32]])
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    try:
        fused = SetAbstractionMSG(**kw)
        fv = fused.init(jax.random.key(0), xyz, feats, True)
        (_, fo), _ = fused.apply(fv, xyz, feats, True,
                                 mutable=["batch_stats"])
    finally:
        os.environ["POINTCLOUDLIB_FUSED_SA"] = "0"
    try:
        unfused = SetAbstractionMSG(**kw)
        uv = unfused.init(jax.random.key(0), xyz, feats, True)
        for s in (0, 1):
            fp = fv["params"][f"FusedSetAbstraction_{s}"]
            up = uv["params"][f"PointMLP_{s}"]
            for i, w in enumerate(("w1", "w2", "w3")):
                up[f"DenseBNAct_{i}"]["Dense_0"]["kernel"] = fp[w]
                up[f"DenseBNAct_{i}"]["BatchNorm_0"]["scale"] = \
                    fp[f"bn{i+1}_scale"]
                up[f"DenseBNAct_{i}"]["BatchNorm_0"]["bias"] = \
                    fp[f"bn{i+1}_bias"]
        (_, uo), _ = unfused.apply(uv, xyz, feats, True,
                                   mutable=["batch_stats"])
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]
    np.testing.assert_allclose(np.asarray(fo), np.asarray(uo),
                               rtol=0.06, atol=0.08)


def test_bq_fused_matches_separate():
    """fused_sa_bq_train/_eval (ball query inside the gather kernel)
    must equal ball_query + fused_sa_train/_eval — including
    repeat-first padding in the BN statistics and empty rows."""
    import pointcloudlib_tpu.ops.pallas.fused_sa as fs
    from pointcloudlib_tpu.ops.geometry import (
        ball_query, farthest_point_sample, index_points,
    )

    rng = np.random.default_rng(9)
    b, n, m, k = 2, 256, 64, 16
    c1, c2, c3 = 16, 16, 32
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    fidx = farthest_point_sample(xyz, m)
    new_xyz = index_points(xyz, fidx)
    # one far-away center -> empty row (cnt == 0 fallback)
    new_xyz = new_xyz.at[0, 0].set(jnp.asarray([50.0, 50.0, 50.0]))
    radius = 0.4
    w1 = jnp.asarray(rng.standard_normal((3, c1)) * 0.3, jnp.float32)
    q = jnp.dot(xyz.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    off = jnp.dot(new_xyz.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    params = fs.SAParams(
        w2=jnp.asarray(rng.standard_normal((c1, c2)) * 0.3, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((c2, c3)) * 0.3, jnp.float32),
        g1=jnp.ones((c1,)), b1=jnp.zeros((c1,)),
        g2=jnp.ones((c2,)), b2=jnp.zeros((c2,)),
        g3=jnp.ones((c3,)), b3=jnp.zeros((c3,)),
    )

    def run_sep(q, off, params):
        nidx, _ = ball_query(new_xyz, xyz, radius, k)
        out, stats = fs.fused_sa_train(q, off, nidx, params, True,
                                       None, 1)
        return jnp.sum(out * out), (out, stats)

    def run_bq(q, off, params):
        out, stats = fs.fused_sa_bq_train(new_xyz, xyz, q, off, params,
                                          radius, k, True, None, 1)
        return jnp.sum(out * out), (out, stats)

    (l0, (o0, s0)), g0 = jax.value_and_grad(
        run_sep, argnums=(0, 1, 2), has_aux=True)(q, off, params)
    (l1, (o1, s1)), g1 = jax.value_and_grad(
        run_bq, argnums=(0, 1, 2), has_aux=True)(q, off, params)
    # idx and the h1 checkpoint are BIT-identical between the paths
    # (verified in development); the residual differences come from BN
    # sums accumulated slot-major vs row-major (f32 reassociation over
    # ~2k terms), amplified through three 1/sigma normalizations
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=5e-3, atol=5e-3)
    for a, b_ in zip(jax.tree_util.tree_leaves(s0),
                     jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-2, atol=1e-2)
    # gradients: the tiny stat differences can flip a max-pool tie,
    # redistributing a gradient unit between two equally-valid rows —
    # compare tie-robustly (few outliers, tiny mean deviation)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        a, b_ = np.asarray(a), np.asarray(b_)
        d = np.abs(a - b_)
        tol = 1e-2 + 1e-2 * np.abs(b_)
        assert (d > tol).mean() < 5e-3, (d > tol).mean()
        assert d.mean() < 3e-3 * max(1.0, np.abs(b_).mean()), d.mean()

    # eval
    stats = fs.SAStats(*[jnp.full((c,), v, jnp.float32)
                         for c, v in ((c1, 0.1), (c1, 1.0), (c2, 0.0),
                                      (c2, 1.2), (c3, -0.1),
                                      (c3, 0.9))])
    nidx, _ = ball_query(new_xyz, xyz, radius, k)
    want = fs.fused_sa_eval(q, off, nidx, params, stats, interpret=True)
    got = fs.fused_sa_bq_eval(new_xyz, xyz, q, off, params, stats,
                              radius, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)




def _assert_envelope(o0, o1, g0, g1):
    """Capped-vs-full at the tie-routing envelope: outputs equal except
    isolated near-tie max-pool flips; gradients directionally equal."""
    o0a, o1a = np.asarray(o0), np.asarray(o1)
    d = np.abs(o0a - o1a)
    assert np.mean(d > 5e-4) < 0.005, (np.mean(d > 5e-4), float(d.max()))
    assert float(d.max()) < 0.02, float(d.max())
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        cos, na, nb = _cos(a, b_)
        assert cos > 0.999, cos
        assert abs(na - nb) <= 0.01 * max(nb, 1e-6), (na, nb)

@pytest.mark.parametrize("cap_gather", [False, True],
                         ids=["tail-capped", "gather-capped"])
def test_slot_capped_passes_match_full(cap_gather, monkeypatch):
    """Slot capping (fused_sa.py _kc_variants): with max(cnt) far below
    k, the stats/out/backward passes run on kc < k slots and account
    for the k-kc padding replicas in closed form. Must reproduce the
    full-k computation: the bf16 contraction operands are identical
    (the replica correction is e * a slot-0-rows contraction, sliced
    from the same bf16 tensors — see _slot0), so the only differences
    are f32 accumulation order.

    ``gather-capped`` additionally moves the gather pass inside the
    cond chain (POINTCLOUDLIB_CAP_GATHER): capped-away h1 slots are
    written as slot-0 replicas — bit-identical to gathering them — so
    the same tolerances must hold."""
    from pointcloudlib_tpu.ops import ball_query, fps, index_points
    from pointcloudlib_tpu.ops.pallas import fused_sa as fs

    monkeypatch.setenv("POINTCLOUDLIB_SA_RUNGS", "1")  # rungs are opt-in
    monkeypatch.setenv("POINTCLOUDLIB_CAP_GATHER",
                       "1" if cap_gather else "0")

    b, n, m, k = 2, 256, 64, 32
    c1, c2, c3 = 16, 16, 32
    rng = np.random.default_rng(3)
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = jnp.asarray(xyz)
    new_xyz = index_points(xyz, fps(xyz, m))
    nidx, cnt = ball_query(new_xyz, xyz, 0.2, k)  # tight: cnt << k
    assert int(jnp.max(cnt)) < k // 2, "radius too wide for this test"
    assert fs._kc_variants(k) != [k]

    q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, m, c1)), jnp.float32)
    params = fs.SAParams(
        w2=jnp.asarray(rng.standard_normal((c1, c2)) * 0.1, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((c2, c3)) * 0.1, jnp.float32),
        g1=jnp.ones(c1), b1=jnp.zeros(c1), g2=jnp.ones(c2),
        b2=jnp.zeros(c2), g3=jnp.ones(c3), b3=jnp.zeros(c3))

    def loss(q, off, params, c):
        out, stats = fs.fused_sa_train(q, off, nidx, params, True,
                                       None, 1, c)
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)
                    ).reshape(out.shape)
        return jnp.sum(out * w), (out, stats)

    (l0, (o0, s0)), g0 = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(q, off, params, None)
    (l1, (o1, s1)), g1 = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(q, off, params, cnt)

    # BN stats are plain f32 sums either way; under gather-capping
    # the layer-1 sums also reassociate (e replica adds collapse into
    # one (1+e)*x term), so their envelope widens slightly
    stol = 3e-4 if cap_gather else 1e-5
    for a, b_ in zip(jax.tree_util.tree_leaves(s0),
                     jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=stol, atol=stol)
    if cap_gather:
        # the ~1e-4 BN1-stat shift flips max-pool routing on isolated
        # near-ties (the documented capped-vs-full envelope): judge by
        # flip-count + gradient direction, not elementwise equality
        _assert_envelope(o0, o1, g0, g1)
    else:
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   rtol=1e-4, atol=1e-4)
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g1)):
            a, b_ = np.asarray(a), np.asarray(b_)
            np.testing.assert_allclose(a, b_, rtol=2e-3, atol=2e-3)

    # an inflated cnt forces the 3k/4 rung (kc = 24, which does NOT
    # divide k = 32 — the h1 BlockSpec reads slot block 0 only, so
    # divisibility is not required); still exact since kc >= max(cnt)
    kc34 = 3 * k // 4
    assert kc34 in fs._kc_variants(k)
    cnt34 = jnp.full_like(cnt, kc34 - 2)
    (_, (o34, s34)), g34 = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(q, off, params, cnt34)
    if cap_gather:
        _assert_envelope(o0, o34, g0, g34)
    else:
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o34),
                                   rtol=1e-4, atol=1e-4)
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g34)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)

    # a wide radius keeps the full-k branch: results must be identical
    nidx2, cnt2 = ball_query(new_xyz, xyz, 1.5, k)
    assert int(jnp.min(cnt2)) >= k  # every slot live
    o2, _ = fs.fused_sa_train(q, off, nidx2, params, True, None, 1,
                              None)
    o3, _ = fs.fused_sa_train(q, off, nidx2, params, True, None, 1,
                              cnt2)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o3))


def test_capped_gather_h1_bit_identical():
    """_call_f1(kc): the h1 checkpoint must be BIT-identical to the
    full-k gather — capped-away slots are repeat-padding replicas of
    slot 0 and are written as copies of slot 0's bf16 row; the f32
    Σ/Σ² differ only by accumulation order."""
    from pointcloudlib_tpu.ops import ball_query, fps, index_points
    from pointcloudlib_tpu.ops.pallas import fused_sa as fs

    b, n, m, k, c1 = 2, 256, 64, 32, 16
    rng = np.random.default_rng(9)
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = jnp.asarray(xyz)
    new_xyz = index_points(xyz, fps(xyz, m))
    nidx, cnt = ball_query(new_xyz, xyz, 0.2, k)
    kc = 3 * k // 4
    assert int(jnp.max(cnt)) <= kc

    q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, m, c1)), jnp.float32)
    h_full, p_full = fs._call_f1(q, nidx, off, True)
    h_cap, p_cap = fs._call_f1(q, nidx, off, True, kc=kc)
    np.testing.assert_array_equal(np.asarray(h_full), np.asarray(h_cap))
    # Σ/Σ² reassociate: e replica adds collapse into one (1+e)·x term
    np.testing.assert_allclose(np.asarray(p_full), np.asarray(p_cap),
                               rtol=5e-4, atol=5e-3)


def test_capped_eval_exactly_matches_full(monkeypatch):
    """fused_sa_eval with cnt + the gather-cap gate: capped-away slots
    are repeat padding and cannot raise the max, and eval has no batch
    statistics — so the capped eval output is EXACTLY the full one."""
    from pointcloudlib_tpu.ops import ball_query, fps, index_points
    from pointcloudlib_tpu.ops.pallas import fused_sa as fs

    b, n, m, k = 2, 256, 64, 32
    c1, c2, c3 = 16, 16, 32
    rng = np.random.default_rng(13)
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = jnp.asarray(xyz)
    new_xyz = index_points(xyz, fps(xyz, m))
    nidx, cnt = ball_query(new_xyz, xyz, 0.2, k)
    assert int(jnp.max(cnt)) < k

    q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, m, c1)), jnp.float32)
    params = fs.SAParams(
        w2=jnp.asarray(rng.standard_normal((c1, c2)) * 0.1, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((c2, c3)) * 0.1, jnp.float32),
        g1=jnp.ones(c1), b1=jnp.zeros(c1), g2=jnp.ones(c2),
        b2=jnp.zeros(c2), g3=jnp.ones(c3), b3=jnp.zeros(c3))
    stats = fs.SAStats(
        m1=jnp.zeros(c1), v1=jnp.ones(c1), m2=jnp.zeros(c2),
        v2=jnp.ones(c2), m3=jnp.zeros(c3), v3=jnp.ones(c3))

    monkeypatch.setenv("POINTCLOUDLIB_SA_RUNGS", "1")  # rungs are opt-in
    monkeypatch.setenv("POINTCLOUDLIB_CAP_GATHER", "1")
    o_cap = fs.fused_sa_eval(q, off, nidx, params, stats, True, cnt)
    monkeypatch.setenv("POINTCLOUDLIB_CAP_GATHER", "0")
    o_full = fs.fused_sa_eval(q, off, nidx, params, stats, True, None)
    np.testing.assert_array_equal(np.asarray(o_cap), np.asarray(o_full))
