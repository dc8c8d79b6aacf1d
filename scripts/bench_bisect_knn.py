"""A/B the ball-query MXU cumsum against the log-roll shift-adds on
the real chip: chained-slope timing + compiled bit-parity.

Historical notes (round 3) — two losing variants, both deleted (no
tuned dead code):

* bisection-top-k selection in the fused kNN kernels
  (POINTCLOUDLIB_KNN_BISECT). Measured on chip 2026-08-19: LOST at
  every production shape -- 0.71x at k=20 n=1024, 0.75x at k=40 n=2048
  (compiled set-parity OK). The MXU cumsum won (1.59 -> 1.29 ms at
  512x1024, 8.75 -> 6.85 ms at 512x4096, bit-equal) and is the
  default; POINTCLOUDLIB_MXU_CUMSUM=0 forces rolls.
* chunked-MXU slot extraction in the standalone ball query
  (POINTCLOUDLIB_BQ_CHUNK): 8 slot one-hots per loop trip, indices
  recovered by one [ck·Mt, N] @ [N, 8] byte-split matmul. Measured on
  chip 2026-08-19: bit-equal but 0.57x at 512x1024 (1.16 -> 2.03
  ms/call) and 0.70x at 512x4096 (7.21 -> 10.29 ms/call) — building
  the [ck·Mt, N] bf16 one-hot costs more VPU than the ck
  select+reduce passes it replaces. Do not retry.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def slope(make_chain, x, lo=2, hi=6):
    tl = bench(jax.jit(lambda x: make_chain(x, lo)), x)
    th = bench(jax.jit(lambda x: make_chain(x, hi)), x)
    return (th - tl) / (hi - lo), tl, th


def main():
    rng = np.random.default_rng(0)
    from pointcloudlib_tpu.ops.dispatch import fps
    from pointcloudlib_tpu.ops.geometry import index_points
    from pointcloudlib_tpu.ops.spatial import canonicalize
    from bench import _surface_clouds

    for b, n, m, k in ((32, 1024, 512, 64), (32, 4096, 512, 64)):
        _bq_shape(rng, b, n, m, k, fps, index_points, canonicalize,
                  _surface_clouds)


def _bq_shape(rng, b, n, m, k, fps, index_points, canonicalize,
              _surface_clouds):
    from pointcloudlib_tpu.ops.pallas.neighbors import ball_query_pallas

    xyz, _ = _surface_clouds(b, n)
    xyz, _ = canonicalize(jnp.asarray(xyz))
    cen = jax.jit(lambda x: index_points(x, fps(x, m)))(xyz)

    # the public wrapper now keys its jit cache on the gate values
    # (neighbors._gate_key), so env flips retrace correctly
    bq_raw = ball_query_pallas

    def bq_chain(x, r):
        f = x
        for _ in range(r):
            idx, cnt = bq_raw(cen, f, 0.2, k, False)
            f = f + jnp.mean(cnt.astype(jnp.float32)) * 1e-9
        return f

    outs = {}
    for flag in ("0", "1"):
        os.environ["POINTCLOUDLIB_MXU_CUMSUM"] = flag
        per, tl, th = slope(bq_chain, xyz)
        name = "mxu-cumsum" if flag == "1" else "rolls"
        print(f"ball query n={n:<5d}     {name}: {per:6.2f} ms/call",
              flush=True)
        outs[flag] = jax.jit(
            lambda c, x: bq_raw(c, x, 0.2, k, False))(cen, xyz)
    os.environ.pop("POINTCLOUDLIB_MXU_CUMSUM", None)
    for a, b_ in zip(outs["0"], outs["1"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    print("ball query compiled parity OK (bit-equal)", flush=True)


if __name__ == "__main__":
    main()
