"""Kernel-point disposition parity vs the reference's shipped layout.

The reference ships the optimized 15-point disposition it trains with
(networks/cls/kernels/dispositions/k_015_center_3D.ply, produced by
kernel_point_optimization_debug with ratio=0.66,
kernel_points.py:551-698). Our fresh optimizer must land on a layout
with the same geometry statistics — same normalization, same packing —
or KPConv's influence radii see different point densities than the
reference trained for.
"""

from pathlib import Path

import numpy as np
import pytest

from pointcloudlib_tpu.models.kpconv.kernel_points import (
    kernel_dispositions,
    load_kernels,
)
from pointcloudlib_tpu.utils.ply import read_ply

_REF_PLY = Path(
    "/root/reference/networks/cls/kernels/dispositions/k_015_center_3D.ply"
)


def _stats(pts: np.ndarray):
    r = np.linalg.norm(pts, axis=1)
    d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return {
        "mean_radius": r[1:].mean(),     # non-center points
        "max_radius": r.max(),
        "min_spacing": d.min(),
        "mean_nn": d.min(axis=1).mean(),
    }


@pytest.mark.skipif(not _REF_PLY.exists(), reason="reference ply absent")
def test_matches_shipped_reference_layout():
    ref = read_ply(_REF_PLY)
    ref_pts = np.vstack([ref["x"], ref["y"], ref["z"]]).T
    ours = kernel_dispositions(15)

    assert np.allclose(ref_pts[0], 0.0) and np.allclose(ours[0], 0.0)
    rs, os_ = _stats(ref_pts), _stats(ours)
    # normalization: reference ratio=0.66 of the unit radius
    assert abs(rs["mean_radius"] - 0.66) < 1e-2
    assert abs(os_["mean_radius"] - rs["mean_radius"]) < 1e-2
    # packing: nearest-neighbor spacing statistics within 2%
    assert abs(os_["min_spacing"] - rs["min_spacing"]) < 0.02 * rs["min_spacing"]
    assert abs(os_["mean_nn"] - rs["mean_nn"]) < 0.02 * rs["mean_nn"]
    # both layouts put every free point on (or very near) one shell
    r_ref = np.linalg.norm(ref_pts[1:], axis=1)
    r_ours = np.linalg.norm(ours[1:], axis=1)
    assert r_ref.std() < 0.01 and r_ours.std() < 0.01


def test_load_kernels_rotation_is_about_z():
    """For fixed='center' the reference rotates the layout about the z
    axis only (kernel_points.py:754-757): z coordinates of the scaled
    layout must be preserved up to the 0.01 noise."""
    base = kernel_dispositions(15)
    k = load_kernels(1.2, 15, seed=3)
    z_sorted_base = np.sort(base[:, 2] * 1.2)
    z_sorted_loaded = np.sort(k[:, 2])
    assert np.allclose(z_sorted_base, z_sorted_loaded, atol=0.05)
    # radii preserved by rotation (noise-level tolerance)
    assert np.allclose(
        np.sort(np.linalg.norm(base * 1.2, axis=1)),
        np.sort(np.linalg.norm(k, axis=1)),
        atol=0.05,
    )


def test_ply_cache_roundtrip(tmp_path, monkeypatch):
    import pointcloudlib_tpu.models.kpconv.kernel_points as kp

    monkeypatch.setattr(kp, "_CACHE_DIR", tmp_path)
    a = kp.kernel_dispositions(15)
    assert (tmp_path / "k_015_center_3D.ply").exists()
    b = kp.kernel_dispositions(15)  # second call reads the ply cache
    np.testing.assert_allclose(a, b, atol=1e-6)


class TestSphericalLloyd:
    """The K>30 generator (reference spherical_Lloyd,
    kernel_points.py:371-548): a Monte-Carlo centroidal-Voronoi layout
    in the unit ball, center pinned, no 0.66 renormalization."""

    def test_lloyd_layout_properties(self, tmp_path, monkeypatch):
        import pointcloudlib_tpu.models.kpconv.kernel_points as kpmod

        monkeypatch.setattr(kpmod, "_CACHE_DIR", tmp_path)
        pts = kernel_dispositions(40)
        assert pts.shape == (40, 3)
        assert np.isfinite(pts).all()
        np.testing.assert_allclose(pts[0], 0.0, atol=1e-7)  # pinned
        r = np.linalg.norm(pts, axis=1)
        assert r.max() <= 1.0 + 1e-5
        # volume-filling CVT: mean non-center radius near E[r] of a
        # uniform ball partition (≈0.75 for dim 3), NOT the repulsive
        # optimizer's 0.66 shell normalization
        assert 0.55 < r[1:].mean() < 0.9, r[1:].mean()
        # cells are even: nearest-neighbor spacings cluster tightly
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = d.min(axis=1)
        assert nn.min() > 0.15, nn.min()       # no collapsed cells
        assert nn.std() / nn.mean() < 0.35     # near-uniform CVT
        # deterministic: regeneration reproduces the cached layout
        (tmp_path / "k_040_center_3D.ply").unlink()
        pts2 = kernel_dispositions(40)
        np.testing.assert_allclose(pts, pts2, atol=1e-6)

    def test_load_kernels_routes_and_scales(self, tmp_path, monkeypatch):
        import pointcloudlib_tpu.models.kpconv.kernel_points as kpmod

        monkeypatch.setattr(kpmod, "_CACHE_DIR", tmp_path)
        kpmod.load_kernels.cache_clear()
        k1 = load_kernels(1.0, 40)
        k2 = load_kernels(2.0, 40)
        assert k1.shape == (40, 3)
        np.testing.assert_allclose(k2, 2 * k1, rtol=1e-5)
        np.testing.assert_allclose(k1[0], 0.0, atol=1e-7)
        kpmod.load_kernels.cache_clear()
