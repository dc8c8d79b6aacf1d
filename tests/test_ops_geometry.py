"""Unit tests for core geometry ops vs dense numpy references.

Mirrors the reference's only kernel test (misc/ops.py:748-783
test_cuda_knn: CUDA KNN vs matmul+topk) but as a real pytest suite:
every op is checked against an O(N^2)/O(N^3) brute-force numpy oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu import ops


def _clouds(b=4, n=128, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, n, c)).astype(np.float32)


class TestSquareDistance:
    def test_matches_bruteforce(self):
        a, b = _clouds(2, 64), _clouds(2, 96, seed=1)
        d2 = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
        ref = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(d2, ref, atol=1e-4)

    def test_nonnegative(self):
        a = _clouds(2, 64)
        d2 = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(a)))
        assert (d2 >= 0).all()
        np.testing.assert_allclose(np.diagonal(d2, axis1=1, axis2=2), 0, atol=1e-4)


class TestIndexPoints:
    def test_2d_idx(self):
        pts = _clouds(3, 32, 5)
        idx = np.array([[0, 5, 31], [1, 1, 2], [30, 0, 7]], dtype=np.int32)
        out = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(3):
            np.testing.assert_array_equal(out[b], pts[b, idx[b]])

    def test_3d_idx(self):
        pts = _clouds(2, 16, 4)
        idx = np.random.default_rng(0).integers(0, 16, (2, 8, 3)).astype(np.int32)
        out = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx)))
        assert out.shape == (2, 8, 3, 4)
        for b in range(2):
            np.testing.assert_array_equal(out[b], pts[b][idx[b]])


class TestKNN:
    def test_sorted_and_exact(self):
        q, p = _clouds(2, 33), _clouds(2, 77, seed=3)
        d2, idx = ops.knn(jnp.asarray(q), jnp.asarray(p), k=7)
        d2, idx = np.asarray(d2), np.asarray(idx)
        ref = ((q[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
        for b in range(2):
            for i in range(33):
                want = set(np.argsort(ref[b, i], kind="stable")[:7].tolist())
                assert set(idx[b, i].tolist()) == want
                np.testing.assert_allclose(
                    np.sort(d2[b, i]), np.sort(ref[b, i])[:7], atol=1e-4
                )
        assert (np.diff(d2, axis=-1) >= -1e-5).all(), "ascending distance"

    def test_self_included(self):
        p = _clouds(1, 50)
        _, idx = ops.knn(jnp.asarray(p), jnp.asarray(p), k=3)
        np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(50))


class TestBallQuery:
    def test_first_k_in_index_order(self):
        rng = np.random.default_rng(7)
        centers = rng.standard_normal((2, 20, 3)).astype(np.float32)
        points = rng.standard_normal((2, 200, 3)).astype(np.float32)
        r, k = 0.9, 16
        idx, cnt = ops.ball_query(
            jnp.asarray(centers), jnp.asarray(points), r, k
        )
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        d2 = ((centers[:, :, None] - points[:, None]) ** 2).sum(-1)
        for b in range(2):
            for m in range(20):
                inside = np.nonzero(d2[b, m] < r * r)[0]
                assert cnt[b, m] == len(inside)
                take = min(k, len(inside))
                np.testing.assert_array_equal(idx[b, m, :take], inside[:take])
                if 0 < len(inside) < k:
                    # short rows padded with the first in-radius index
                    np.testing.assert_array_equal(
                        idx[b, m, take:], np.full(k - take, inside[0])
                    )

    def test_empty_row_falls_back_to_zero(self):
        centers = np.full((1, 1, 3), 100.0, np.float32)
        points = np.zeros((1, 8, 3), np.float32)
        idx, cnt = ops.ball_query(jnp.asarray(centers), jnp.asarray(points), 0.5, 4)
        assert int(np.asarray(cnt)[0, 0]) == 0
        np.testing.assert_array_equal(np.asarray(idx)[0, 0], 0)


class TestFPS:
    @staticmethod
    def _fps_oracle(xyz, m, skip):
        n = xyz.shape[0]
        mind = np.full(n, 1e10, np.float64)
        eligible = (xyz**2).sum(-1) > 1e-3 if skip else np.ones(n, bool)
        out = [0]
        for _ in range(m - 1):
            d = ((xyz - xyz[out[-1]]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            score = np.where(eligible, mind, -1.0)
            out.append(int(score.argmax()))
        return np.array(out)

    @pytest.mark.parametrize("skip", [True, False])
    def test_matches_oracle(self, skip):
        xyz = _clouds(3, 100, seed=11)
        idx = np.asarray(
            ops.farthest_point_sample(jnp.asarray(xyz), 17, skip_near_origin=skip)
        )
        for b in range(3):
            np.testing.assert_array_equal(
                idx[b], self._fps_oracle(xyz[b].astype(np.float64), 17, skip)
            )

    def test_seeds_zero_and_unique(self):
        xyz = _clouds(2, 64, seed=5)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 32))
        assert (idx[:, 0] == 0).all()
        for b in range(2):
            assert len(set(idx[b].tolist())) == 32

    def test_skips_near_origin_padding(self):
        rng = np.random.default_rng(0)
        xyz = rng.standard_normal((1, 32, 3)).astype(np.float32) + 5.0
        xyz[0, 10:20] = 0.0  # padding rows
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 12))
        assert not set(range(10, 20)) & set(idx[0, 1:].tolist())


class TestThreeNN:
    def test_interpolation_exact_on_knots(self):
        # Interpolating at the support points themselves must return their
        # features (weight of d2=0 neighbor dominates: 1e10 vs O(1)).
        pts = _clouds(2, 40)
        feats = _clouds(2, 40, 8, seed=9)
        out = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(feats)
            )
        )
        np.testing.assert_allclose(out, feats, atol=1e-3)

    def test_weights_sum_to_one(self):
        q, p = _clouds(2, 30, seed=2), _clouds(2, 50, seed=3)
        _, w = ops.three_nn(jnp.asarray(q), jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)

    def test_weights_independent_of_knn_d2(self, monkeypatch):
        """three_nn must recompute d2 from the gathered coords, never
        trust the knn route's returned values: on TPU the routes'
        expansion-form d2 carries bf16 cross-term noise (~2^-8·|x|²),
        which poisons 1/(d2+1e-8) weights at self-pairs (true d2=0 →
        hard copy). Guard: corrupt the returned d2 and require
        identical weights."""
        from pointcloudlib_tpu.ops import geometry

        q, p = _clouds(2, 30, seed=2), _clouds(2, 50, seed=3)
        _, w0 = geometry.three_nn(jnp.asarray(q), jnp.asarray(p))

        real_knn = geometry.knn

        def noisy_knn(query, points, k):
            d2, idx = real_knn(query, points, k)
            return d2 + 1e-3, idx  # bf16-scale corruption

        monkeypatch.setattr(geometry, "knn", noisy_knn)
        _, w1 = geometry.three_nn(jnp.asarray(q), jnp.asarray(p))
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))

    def test_fused_route_matches_xla(self, monkeypatch):
        """The TPU route (knn_gather kernel, interpret mode here)
        matches the XLA route: outputs to the weight-rounding
        tolerance (d2 is recomputed as (q−g)², the XLA path uses the
        expansion form) and gradients through the feats scatter."""
        import jax

        from pointcloudlib_tpu.ops import dispatch, geometry

        rng = np.random.default_rng(17)
        b, n, m, c = 2, 256, 48, 16
        q = jnp.asarray(rng.standard_normal((b, m, 3)), jnp.float32)
        p = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
        f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

        # fused route is opt-in since round 3 (slower than the XLA
        # route at the FP decoder shapes on realistic clouds)
        monkeypatch.setenv("POINTCLOUDLIB_FUSED_3NN", "1")

        def loss(f, use):
            monkeypatch.setattr(dispatch, "USE_PALLAS", use)
            out = geometry.three_nn_interpolate(q, p, f)
            return jnp.sum(out * out), out

        (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(f, True)
        (l0, o0), g0 = jax.value_and_grad(loss, has_aux=True)(f, False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-3, atol=1e-3)


class TestGrouping:
    def test_group_points_recenters(self):
        pts = _clouds(2, 32)
        feats = _clouds(2, 32, 6, seed=1)
        centers = pts[:, :4]
        idx = np.random.default_rng(0).integers(0, 32, (2, 4, 8)).astype(np.int32)
        out = np.asarray(
            ops.group_points(
                jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(centers),
                jnp.asarray(idx),
            )
        )
        assert out.shape == (2, 4, 8, 9)
        for b in range(2):
            np.testing.assert_allclose(
                out[b, :, :, :3],
                pts[b][idx[b]] - centers[b][:, None],
                atol=1e-6,
            )
            np.testing.assert_array_equal(out[b, :, :, 3:], feats[b][idx[b]])

    def test_group_all_shape_and_abs_xyz(self):
        pts, feats = _clouds(2, 16), _clouds(2, 16, 5, seed=4)
        out = np.asarray(ops.group_all(jnp.asarray(pts), jnp.asarray(feats)))
        assert out.shape == (2, 1, 16, 8)
        np.testing.assert_array_equal(out[:, 0, :, :3], pts)


class TestDensity:
    def test_matches_formula(self):
        xyz = _clouds(2, 48)
        bw = 0.25
        got = np.asarray(ops.compute_density(jnp.asarray(xyz), bw))
        d2 = ((xyz[:, :, None] - xyz[:, None]) ** 2).sum(-1)
        ref = (np.exp(-d2 / (2 * bw * bw)) / (2.5 * bw)).mean(-1)
        np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_ops_jit_and_grad():
    """Everything must be jit-safe; grouping must be differentiable."""
    xyz = jnp.asarray(_clouds(2, 64))
    feats = jnp.asarray(_clouds(2, 64, 8, seed=1))

    @jax.jit
    def pipeline(xyz, feats):
        idx = ops.farthest_point_sample(xyz, 16)
        centers = ops.index_points(xyz, idx)
        nidx, _ = ops.ball_query(centers, xyz, 0.5, 8)
        g = ops.group_points(xyz, feats, centers, nidx)
        return g.max(axis=2).sum()

    v, grad = jax.value_and_grad(pipeline, argnums=1)(xyz, feats)
    assert np.isfinite(v)
    assert np.isfinite(np.asarray(grad)).all()
