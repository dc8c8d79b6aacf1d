"""PLY I/O round-trip tests."""

import numpy as np
import pytest

from pointcloudlib_tpu.utils.ply import read_ply, write_ply


@pytest.mark.parametrize("binary", [True, False])
def test_roundtrip(tmp_path, binary):
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((50, 3)).astype(np.float32)
    labels = rng.integers(0, 10, 50).astype(np.int32)
    path = tmp_path / "cloud.ply"
    write_ply(path, {"xyz": xyz, "label": labels}, binary=binary)
    out = read_ply(path)
    got = np.stack([out["x"], out["y"], out["z"]], 1)
    np.testing.assert_allclose(got, xyz, rtol=1e-6)
    np.testing.assert_array_equal(out["label"], labels)


def test_normals_and_colors(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.standard_normal((8, 3)).astype(np.float32)
    nrm = rng.standard_normal((8, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (8, 3)).astype(np.uint8)
    path = tmp_path / "c.ply"
    write_ply(path, {"xyz": xyz, "normals": nrm, "rgb": rgb})
    out = read_ply(path)
    assert set(out) == {"x", "y", "z", "nx", "ny", "nz",
                        "red", "green", "blue"}
    np.testing.assert_allclose(out["nx"], nrm[:, 0], rtol=1e-6)
    np.testing.assert_array_equal(out["blue"], rgb[:, 2])
