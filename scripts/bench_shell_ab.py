"""Re-run bench workloads on the OLD round-2 shell-cloud profile.

VERDICT r3 weak #4: KPConv slid 522.7 -> 463.7 and pointconv partseg
169.6 -> 144.9 between rounds 2 and 3 "without a recorded
explanation". The r2 numbers were measured on sphere-SHELL clouds
(Gaussians normalized onto the unit sphere); r3 moved bench.py to
object-SURFACE clouds with ~4x denser r=0.2 neighborhoods. This A/B
isolates the data-profile term: same bench.py timing loop, same
models, shell clouds swapped in. If shell recovers the r2 rates, the
"slide" is the honest-data cost of occupancy-adaptive kernels, not a
code regression.

Run (one TPU job at a time):
    python scripts/bench_shell_ab.py kpconv pointconv_shapenet
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def _shell_clouds(batch_size, n_points, seed=0):
    """Round-2 profile: unit-sphere SHELL points (uniform solid angle),
    normals = the radial direction (what r2's bench fed)."""
    rng = np.random.default_rng(seed)
    xyz = rng.standard_normal((batch_size, n_points, 3)).astype(
        np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    return xyz, xyz.copy()


def main():
    import bench

    bench._surface_clouds = _shell_clouds
    print("# shell-cloud A/B (r2 data profile)", flush=True)
    bench.main()


if __name__ == "__main__":
    main()
