"""sample_and_group / fps_gather oracles (PointConv path)."""

import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu import ops


def test_sample_and_group_contract():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 64, 5)), jnp.float32)
    density = jnp.asarray(rng.random((2, 64)), jnp.float32)

    new_xyz, grouped, gd = ops.sample_and_group(
        xyz, feats, n_points=16, k=8, density=density
    )
    assert new_xyz.shape == (2, 16, 3)
    assert grouped.shape == (2, 16, 8, 8)  # 3 local xyz + 5 feats
    assert gd.shape == (2, 16, 8, 1)

    # first grouped slot of each center is the center itself (kNN
    # includes self) → local xyz ≈ 0
    np.testing.assert_allclose(
        np.asarray(grouped[:, :, 0, :3]), 0.0, atol=1e-5
    )
    # centers come from FPS with no near-origin skip (reference
    # misc/utils.py:74): first center is point 0
    np.testing.assert_allclose(
        np.asarray(new_xyz[:, 0]), np.asarray(xyz[:, 0]), atol=1e-6
    )


def test_fps_gather_returns_points():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    out = ops.fps_gather(xyz, 8)
    idx = ops.farthest_point_sample(xyz, 8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ops.index_points(xyz, idx)), atol=1e-6
    )

def test_knn_gather_matches_separate_ops():
    """knn_gather (graph built inside the gather kernel, interpret
    mode) == knn + take_along_axis: indices, values (~1-ulp via the
    hi/lo split), and gradients through the scatter."""
    import jax
    import jax.numpy as jnp

    from pointcloudlib_tpu.ops.geometry import knn
    from pointcloudlib_tpu.ops.pallas.neighbors import knn_gather

    rng = np.random.default_rng(11)
    b, n, m, k, cv = 2, 256, 64, 8, 9
    q = jnp.asarray(rng.standard_normal((b, m, 3)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((b, n, cv)), jnp.float32)

    _, want_idx = knn(q, pts, k)

    def run(vals):
        idx, g = knn_gather(q, pts, vals, k, True)
        return jnp.sum(g * g), (idx, g)

    (l, (idx, g)), dv = jax.value_and_grad(run, has_aux=True)(vals)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_g = jnp.take_along_axis(
        vals[:, None].repeat(m, 1) if False else vals,
        idx.reshape(b, m * k)[..., None], axis=1).reshape(b, m, k, cv)
    # hi/lo bf16 split accuracy ~2^-17 relative (same as gather.py)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want_g),
                               rtol=2e-5, atol=2e-5)

    def run_ref(vals):
        g = jnp.take_along_axis(
            vals, want_idx.reshape(b, m * k)[..., None], axis=1
        ).reshape(b, m, k, cv)
        return jnp.sum(g * g)

    dv_ref = jax.grad(run_ref)(vals)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-5, atol=1e-5)


def test_knn_gather_stride_matches_dilated_knn():
    """stride=D == knn(k·D) + idx[..., ::D] + gather (PointCNN dilated
    kNN, reference misc/layers.py:354-358) — indices exactly, values to
    the hi/lo split tolerance; ordered=True keeps ranks ascending."""
    import jax.numpy as jnp

    from pointcloudlib_tpu.ops.geometry import knn
    from pointcloudlib_tpu.ops.pallas.neighbors import knn_gather

    rng = np.random.default_rng(5)
    b, n, m, k, d, cv = 2, 256, 32, 6, 3, 17
    q = jnp.asarray(rng.standard_normal((b, m, 3)), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((b, n, cv)), jnp.float32)

    idx, g = knn_gather(q, pts, vals, k, True, d, True)
    _, want_idx = knn(q, pts, k * d)
    want_idx = want_idx[..., ::d]
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    want_g = jnp.take_along_axis(
        vals, want_idx.reshape(b, m * k)[..., None], axis=1
    ).reshape(b, m, k, cv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want_g),
                               rtol=2e-5, atol=2e-5)


def test_pointcnn_layer_fused_route_matches_xla(monkeypatch):
    """PointCNNLayer through the fused dilated-kNN gather (interpret)
    == the knn + index_points route, same variables."""
    import jax

    from pointcloudlib_tpu.models.pointcnn import PointCNNLayer
    from pointcloudlib_tpu.ops import dispatch

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    fts = jnp.asarray(rng.standard_normal((2, 128, 32)), jnp.float32)
    # p=-1: rep = pts, no FPS — forcing USE_PALLAS on CPU would send
    # the FPS kernel down the compiled (non-interpret) path
    layer = PointCNNLayer(32, 64, k=4, d=2, p=-1)
    variables = layer.init(jax.random.key(0), pts, fts)

    monkeypatch.setattr(dispatch, "USE_PALLAS", False)
    rep0, out0 = layer.apply(variables, pts, fts)
    monkeypatch.setattr(dispatch, "USE_PALLAS", True)
    rep1, out1 = layer.apply(variables, pts, fts)
    np.testing.assert_allclose(np.asarray(rep1), np.asarray(rep0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-4, atol=1e-4)
