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
