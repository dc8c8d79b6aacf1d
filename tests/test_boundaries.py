"""Boundary shapes that have caught real bugs before (.claude/skills/
verify: k == N selections, n_samples == N FPS, all-padding clouds) —
pinned here so they run in CI instead of only during chip verification.
"""

import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu import ops


def _cloud(b=2, n=64, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    return jnp.asarray(xyz)


def test_fps_all_points():
    """n_samples == N: every point selected exactly once per cloud."""
    xyz = _cloud()
    idx = np.asarray(ops.farthest_point_sample(xyz, xyz.shape[1]))
    for row in idx:
        assert sorted(row.tolist()) == list(range(xyz.shape[1]))


def test_fps_all_padding_cloud():
    """A cloud that is entirely near-origin padding must still emit
    valid indices (the reference skips mag<=1e-3 points; with nothing
    eligible the selection falls back deterministically)."""
    xyz = jnp.zeros((1, 32, 3), jnp.float32)
    idx = np.asarray(ops.farthest_point_sample(xyz, 8))
    assert ((0 <= idx) & (idx < 32)).all()


def test_knn_k_equals_n():
    """k == N: the neighbor set is all points; union of indices per
    row must be exactly 0..N-1."""
    xyz = _cloud(n=32)
    _, idx = ops.knn(xyz[:, :8], xyz, 32)
    idx = np.asarray(idx)
    for b in range(idx.shape[0]):
        for q in range(idx.shape[1]):
            assert sorted(idx[b, q].tolist()) == list(range(32))


def test_ball_query_k_equals_n_all_in_radius():
    """radius covering everything and k == N: cnt == N everywhere and
    each row is a permutation-free index-ordered list (first-k-in-
    index-order semantics => exactly arange)."""
    xyz = _cloud(n=32)
    idx, cnt = ops.ball_query(xyz[:, :8], xyz, 10.0, 32)
    assert (np.asarray(cnt) == 32).all()
    np.testing.assert_array_equal(
        np.asarray(idx),
        np.broadcast_to(np.arange(32, dtype=np.int32),
                        np.asarray(idx).shape))


def test_group_all_single_group():
    """group_all is the m == 1 degenerate grouping (reference
    misc/ops.py:410-419)."""
    xyz = _cloud(n=16)
    feats = jnp.ones((2, 16, 4), jnp.float32)
    g = ops.group_all(xyz, feats)
    assert g.shape == (2, 1, 16, 3 + 4)
