"""Pallas ball-query / kNN kernels vs the XLA geometry ops
(interpret mode; compiled parity is part of the TPU verify recipe)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu.ops import ball_query, knn
from pointcloudlib_tpu.ops.pallas.neighbors import (
    ball_query_pallas,
    knn_pallas,
)


@pytest.mark.parametrize("b,m,n,k,r", [(2, 16, 200, 8, 0.9), (1, 32, 64, 16, 1.5)])
def test_ball_query_matches_xla(b, m, n, k, r):
    rng = np.random.default_rng(b * 100 + n)
    centers = jnp.asarray(rng.standard_normal((b, m, 3)), jnp.float32)
    points = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    want_idx, want_cnt = ball_query(centers, points, r, k)
    got_idx, got_cnt = ball_query_pallas(centers, points, r, k,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(want_cnt))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


def test_ball_query_empty_rows():
    centers = jnp.full((1, 4, 3), 50.0, jnp.float32)
    points = jnp.zeros((1, 16, 3), jnp.float32)
    idx, cnt = ball_query_pallas(centers, points, 0.5, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(cnt), 0)
    np.testing.assert_array_equal(np.asarray(idx), 0)


@pytest.mark.parametrize(
    "sorted_cloud", [False, True], ids=["random", "canonicalized"]
)
def test_ball_query_block_sparse_matches_xla(sorted_cloud):
    """ball_query_pallas exactness vs the XLA path at n=1024, on both
    random and Hilbert-canonicalized clouds. (A block-sparse routing
    variant was prototyped and rejected on measured perf — see
    docs/DESIGN.md; there is no n-dependent routing in
    ball_query_pallas.)"""
    rng = np.random.default_rng(7)
    b, m, n, k, r = 2, 64, 1024, 16, 0.3
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    points = jnp.asarray(pts)
    if sorted_cloud:
        from pointcloudlib_tpu.ops.spatial import canonicalize

        points, _ = canonicalize(points)
    centers = points[:, :: n // m][:, :m]
    want_idx, want_cnt = ball_query(centers, points, r, k)
    got_idx, got_cnt = ball_query_pallas(centers, points, r, k,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got_cnt),
                                  np.asarray(want_cnt))
    np.testing.assert_array_equal(np.asarray(got_idx),
                                  np.asarray(want_idx))


def test_ball_query_block_sparse_empty_rows():
    centers = jnp.full((1, 8, 3), 50.0, jnp.float32)
    points = jnp.zeros((1, 1024, 3), jnp.float32)
    idx, cnt = ball_query_pallas(centers, points, 0.5, 4,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(cnt), 0)
    np.testing.assert_array_equal(np.asarray(idx), 0)


@pytest.mark.parametrize("b,m,n,k", [(2, 16, 100, 7), (1, 8, 130, 20)])
def test_knn_matches_xla(b, m, n, k):
    rng = np.random.default_rng(b + n + k)
    q = jnp.asarray(rng.standard_normal((b, m, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    want_d2, want_idx = knn(q, p, k)
    got_d2, got_idx = knn_pallas(q, p, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_allclose(
        np.asarray(got_d2), np.asarray(want_d2), rtol=1e-5, atol=1e-5
    )


def test_mxu_cumsum_bitexact():
    """The MXU cumsum path (POINTCLOUDLIB_MXU_CUMSUM=1) must produce
    bit-identical ball-query results to the log-roll path: counts are
    exact integers in both (bf16 0/1 operands, f32 accumulate)."""
    import os

    from pointcloudlib_tpu.ops.pallas.neighbors import (
        _cumsum_matmul, ball_query_pallas,
    )

    rng = np.random.default_rng(5)
    # helper vs numpy oracle at several widths (incl. non-512-mult)
    for mt, n in [(8, 256), (16, 1024), (8, 2048), (8, 384)]:
        m = (rng.random((mt, n)) < 0.3).astype(np.int32)
        b = np.asarray(_cumsum_matmul(jnp.asarray(m)))
        np.testing.assert_array_equal(np.cumsum(m, axis=1), b)

    xyz = rng.standard_normal((2, 1024, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = jnp.asarray(xyz)
    c = xyz[:, :256]

    def run(flag):
        os.environ["POINTCLOUDLIB_MXU_CUMSUM"] = flag
        try:
            # the wrapper keys its jit cache on the gate value now
            return ball_query_pallas(c, xyz, 0.2, 32, True)
        finally:
            os.environ.pop("POINTCLOUDLIB_MXU_CUMSUM", None)

    i0, c0 = run("0")
    i1, c1 = run("1")
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

