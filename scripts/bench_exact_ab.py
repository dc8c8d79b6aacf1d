"""Measure the throughput cost of the round-3 exact-d² fixes.

VERDICT r3 weak #4 follow-up: the shell-vs-surface A/B
(scripts/bench_shell_ab.py, r4) showed BOTH the KPConv slide
(522.7 -> 459) and the pointconv-seg slide (169.6 -> 144) are
data-profile-INDEPENDENT — so the suspects are the r3 exactness
fixes, both of which are correctness-motivated and well-documented:

* KPConv's radius search runs knn_pallas(exact=True) so borderline
  in-radius membership matches the host/native builder bit-for-bit
  (models/kpconv/pyramid.py:163-177).
* pointconv's compute_density uses square_distance(exact=True)
  because d² VALUES feed the Gaussian KDE (the r3 convergence
  defect, docs/DESIGN.md).

This A/B turns each back OFF (measurement only — the exact forms are
the shipped defaults for convergence/parity reasons) to attribute the
cost. Run one arm at a time:

    python scripts/bench_exact_ab.py kpconv
    python scripts/bench_exact_ab.py pointconv_shapenet
"""

import functools
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax.numpy as jnp

    from pointcloudlib_tpu.ops import geometry
    from pointcloudlib_tpu.ops.pallas import neighbors

    # arm 1: radius-search kNN without the exact cross term
    orig_knn = neighbors.knn_pallas

    @functools.wraps(orig_knn)
    def knn_fast(*args, **kw):
        kw["exact"] = False
        return orig_knn(*args, **kw)

    neighbors.knn_pallas = knn_fast

    # arm 2: KDE from the default-precision expansion d²
    def density_fast(xyz, bandwidth):
        d2 = geometry.square_distance(xyz, xyz, exact=False)
        g = jnp.exp(-d2 / (2.0 * bandwidth * bandwidth)) / (
            2.5 * bandwidth)
        return jnp.mean(g, axis=-1)

    # pointconv binds compute_density at module import (early) — patch
    # every site that resolved it
    geometry.compute_density = density_fast
    import pointcloudlib_tpu.models.pointconv as pconv
    import pointcloudlib_tpu.ops as ops_pkg

    ops_pkg.compute_density = density_fast
    pconv.compute_density = density_fast

    import bench

    print("# exact-d2 OFF A/B (cost attribution only)", flush=True)
    bench.main()


if __name__ == "__main__":
    main()
