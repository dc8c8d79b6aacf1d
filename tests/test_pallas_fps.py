"""Pallas FPS kernel vs the lax.scan reference (interpret mode on CPU;
the same parity check runs compiled on real TPU via the verify recipe)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu.ops import farthest_point_sample
from pointcloudlib_tpu.ops.pallas.fps import fps_pallas


@pytest.mark.parametrize("skip", [True, False])
@pytest.mark.parametrize(
    # (2,64,36) is PointConv-partseg's last SA layer: n <= 128 needs the
    # >=256 lane padding (Mosaic argmax legalization bug on one-tile
    # inputs — see fps_pallas) and must stay bit-exact through it.
    "b,n,m",
    [(2, 128, 16), (3, 256, 64), (9, 128, 128), (2, 64, 36), (2, 200, 64)],
)
def test_matches_scan_reference(b, n, m, skip):
    rng = np.random.default_rng(b * 1000 + n + m)
    xyz = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    want = np.asarray(farthest_point_sample(xyz, m, skip_near_origin=skip))
    got = np.asarray(
        fps_pallas(xyz, m, skip_near_origin=skip, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_near_origin_padding_skipped():
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((1, 64, 3)).astype(np.float32) + 4.0
    xyz[0, 40:] = 0.0
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 32, interpret=True))
    assert not (got[0, 1:] >= 40).any()
