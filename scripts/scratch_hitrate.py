"""Window hit rate at the real SA shapes on canonicalized clouds."""

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu.ops.spatial import canonicalize
from pointcloudlib_tpu.ops.geometry import (
    ball_query, farthest_point_sample, index_points,
)
from pointcloudlib_tpu.ops.pallas.fused_sa import (
    _gchunk, _m_tile, _row_perm, _take_rows, _window_plan, _window_width,
)


def check(xyz, m, r, k, c1, label):
    b, n, _ = xyz.shape
    fidx = farthest_point_sample(xyz, m)
    new_xyz = index_points(xyz, fidx)
    nidx, _ = ball_query(new_xyz, xyz, r, k)
    w = _window_width(n)
    if w is None:
        print(f"{label}: windowing off (n={n})")
        return
    sigma, _ = _row_perm(nidx)
    nidx_s = _take_rows(nidx, sigma)
    mt = _m_tile(m, k, bf16_widths=c1)
    cm = _gchunk(mt, k, n)
    starts, nb = _window_plan(nidx_s, cm, w, n)
    narrow = float(jnp.mean((nb == 1).astype(jnp.float32)))
    # index span distribution per chunk
    t = nidx_s.reshape(b, m // cm, cm * k)
    span = np.asarray(jnp.max(t, axis=2) - jnp.min(t, axis=2)).ravel()
    print(f"{label}: n={n} m={m} k={k} mt={mt} cm={cm} w={w} "
          f"narrow={narrow:.2f} span p50={np.percentile(span, 50):.0f} "
          f"p90={np.percentile(span, 90):.0f} max={span.max()}")


def main():
    sys.path.insert(0, "/root/repo")
    from bench import _surface_clouds
    rng = np.random.default_rng(0)
    for n in (1024, 4096):
        x, _ = _surface_clouds(16, n)
        xs, _ = canonicalize(jnp.asarray(x))
        check(xs, 512, 0.2, 64, 64, f"SA1(n={n})")
        # SA2 operates on SA1 centers (FPS order, unsorted)
        fidx = farthest_point_sample(xs, 512)
        c = index_points(xs, fidx)
        check(c, 128, 0.4, 64, 128, f"SA2-fpsorder(n={n})")


if __name__ == "__main__":
    main()
