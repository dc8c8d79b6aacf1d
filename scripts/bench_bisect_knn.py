"""A/B the bisect-selection kNN kernels against the argmin-rounds
path on the real chip: compile check + chained-slope timing + compiled
numeric parity (idx as sets, outputs to tolerance).

Run with the tunnel healthy:  python scripts/bench_bisect_knn.py
Flips to validate: POINTCLOUDLIB_KNN_BISECT and
POINTCLOUDLIB_MXU_CUMSUM (the ball-query MXU cumsum rides along).
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
    from pointcloudlib_tpu.ops.pallas import fused_edge as fe

    rng = np.random.default_rng(0)

    # --- fused edge f1 (the DGCNN train-path selection) ---
    for label, b, n, k, c in [("cls k=20 n=1024", 8, 1024, 20, 64),
                              ("partseg k=40 n=2048", 4, 2048, 40, 64)]:
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, n, c)) * .1,
                          jnp.float32)

        def chain(x, r):
            f = x
            for _ in range(r):
                idx, h, ps = fe._call_eknn_f1(f, q, off, k, False)
                f = f + jnp.mean(ps[0]) * 1e-9 + (
                    jnp.mean(idx.astype(jnp.float32)) * 1e-9)
            return f

        res = {}
        for flag in ("0", "1"):
            os.environ["POINTCLOUDLIB_KNN_BISECT"] = flag
            per, tl, th = slope(chain, x)
            res[flag] = per
            name = "bisect" if flag == "1" else "rounds"
            print(f"{label:22s} {name}: {per:6.2f} ms/call "
                  f"(chain2 {tl:.1f}, chain6 {th:.1f})", flush=True)
        print(f"{label:22s} speedup: {res['0'] / res['1']:.2f}x",
              flush=True)

        # compiled numeric parity
        os.environ["POINTCLOUDLIB_KNN_BISECT"] = "0"
        i0, h0, p0 = jax.jit(
            lambda x: fe._call_eknn_f1(x, q, off, k, False))(x)
        os.environ["POINTCLOUDLIB_KNN_BISECT"] = "1"
        i1, h1, p1 = jax.jit(
            lambda x: fe._call_eknn_f1(x, q, off, k, False))(x)
        np.testing.assert_array_equal(
            np.sort(np.asarray(i0), -1), np.sort(np.asarray(i1), -1))
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=1e-4, atol=1e-4)
        print(f"{label:22s} compiled parity OK (idx sets, stats)",
              flush=True)
    os.environ.pop("POINTCLOUDLIB_KNN_BISECT", None)

    # --- ball-query MXU cumsum ---
    from pointcloudlib_tpu.ops.pallas.neighbors import ball_query_pallas

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
