#!/usr/bin/env python
"""Measure d² precision on TPU across the knn routes, and its effect on
the 3-NN inverse-distance interpolation weights.

Motivation (pointconv-seg convergence): PointConvInterp consumes the d²
VALUES returned by knn for 1/(d²+1e-8) weights. The coarse set is a
subset of the fine set, so self-pairs (true d² = 0) are common — an
exact route copies the coarse feature (normalized self-weight ≈ 1.0),
while a bf16 cross term (MXU default precision) leaves d² noise of
order 2⁻⁸·|x|², softening the copy into a blend. The torch reference
computes d² in f32 throughout.

Arms (same cloud):
  pallas      ops.pallas.neighbors.knn_pallas (default _dist2)
  xla         geometry.knn with POINTCLOUDLIB_KERNELS=xla semantics
              (square_distance expansion, default matmul precision)
  oracle      f64 direct (q−p)² on host

Reports: max |d²−oracle| over self-pairs, and the resulting min/mean
normalized self-weight per arm. Run on TPU (no env gates needed).
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    b, n, m = 4, 1024, 256
    pts = rng.standard_normal((b, n, 3)).astype(np.float32)
    pts /= np.abs(pts).max()
    # query = the first m support points (FPS-like subset: self-pairs)
    q = pts[:, :m].copy()

    oracle = np.sum(
        (q[:, :, None, :].astype(np.float64)
         - pts[:, None, :, :].astype(np.float64)) ** 2, -1)
    self_ij = np.arange(m)

    from pointcloudlib_tpu.ops.geometry import (
        square_distance, _inverse_distance_weights)
    from pointcloudlib_tpu.ops.pallas.neighbors import knn_pallas

    qd, pd = jnp.asarray(q), jnp.asarray(pts)

    def self_weight(d2_sel):
        w = _inverse_distance_weights(d2_sel)
        return np.asarray(w[..., 0])  # slot 0 = nearest = self

    # pallas knn route (returns d2 of selected neighbors)
    d2p, idxp = jax.jit(lambda a, b: knn_pallas(a, b, 3))(qd, pd)
    d2p, idxp = np.asarray(jax.device_get(d2p)), np.asarray(
        jax.device_get(idxp))
    # xla route: full matrix then top_k
    d2x = np.asarray(jax.device_get(
        jax.jit(square_distance)(qd, pd)))
    selx = np.take_along_axis(d2x, idxp, axis=2)  # same cols for A/B

    self_err_p = np.abs(d2p[..., 0][:, self_ij >= 0]
                        - oracle[:, self_ij, self_ij])
    self_err_x = np.abs(d2x[:, self_ij, self_ij]
                        - oracle[:, self_ij, self_ij])
    print(f"self-pair |d2 err|: pallas max={self_err_p.max():.3e} "
          f"mean={self_err_p.mean():.3e}")
    print(f"self-pair |d2 err|: xla    max={self_err_x.max():.3e} "
          f"mean={self_err_x.mean():.3e}")

    swp = self_weight(jnp.asarray(d2p))
    swx = self_weight(jnp.asarray(selx))
    print(f"norm. self-weight: pallas min={swp.min():.4f} "
          f"mean={swp.mean():.4f}   (exact => 1.0)")
    print(f"norm. self-weight: xla    min={swx.min():.4f} "
          f"mean={swx.mean():.4f}")

    # what three_nn_interpolate actually produces today
    from pointcloudlib_tpu.ops.geometry import three_nn
    idx3, w3 = jax.jit(three_nn)(qd, pd)
    w3 = np.asarray(jax.device_get(w3))
    print(f"three_nn self-weight: min={w3[..., 0].min():.4f} "
          f"mean={w3[..., 0].mean():.4f}")


if __name__ == "__main__":
    main()
