"""Decompose windowing overhead vs kernel benefit on TPU (slope-timed)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudlib_tpu.ops.spatial import canonicalize
from pointcloudlib_tpu.ops.geometry import (
    ball_query, farthest_point_sample, index_points,
)
import pointcloudlib_tpu.ops.pallas.fused_sa as fs


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def slope(make_chain, x):
    t2 = bench(jax.jit(lambda v: make_chain(v, 2)), x)
    t8 = bench(jax.jit(lambda v: make_chain(v, 8)), x)
    return (t8 - t2) / 6.0


def main():
    rng = np.random.default_rng(0)
    B, N, M, K, C1 = 64, 1024, 512, 64, 64
    x = rng.standard_normal((B, N, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    x = jnp.asarray(x)

    # 1. canonicalize cost (trainer-side, per step)
    def chain_canon(v, r):
        for _ in range(r):
            v, _ = canonicalize(v)
            v = v + 1e-6
        return v

    print(f"canonicalize [64,1024,3]: {slope(chain_canon, x):.2f} ms")

    # 2. sigma + take_rows cost at SA1
    xs, _ = canonicalize(x)
    fidx = farthest_point_sample(xs, M)
    new_xyz = index_points(xs, fidx)
    nidx, _ = ball_query(new_xyz, xs, 0.2, K)
    off = jnp.asarray(rng.standard_normal((B, M, C1)), jnp.float32)

    def chain_sigma(v, r):
        idx = nidx
        o = v
        for _ in range(r):
            sigma, inv = fs._row_perm(idx)
            idx2 = fs._take_rows(idx, sigma)
            o = fs._take_rows(fs._take_rows(o, sigma), inv)
            idx = idx2 + 0 * jnp.mean(o.astype(jnp.int32))
        return o

    print(f"sigma+3 gathers @SA1:     {slope(chain_sigma, off):.2f} ms")

    # 3. kernel-only: F1 with window vs without, sorted idx
    q = jnp.asarray(rng.standard_normal((B, N, C1)), jnp.float32)
    sigma, inv = fs._row_perm(nidx)
    nidx_s = fs._take_rows(nidx, sigma)

    import os

    def chain_f1(v, r):
        h = v
        for _ in range(r):
            h1, ps = fs._call_f1(h, nidx_s, off, False)
            h = h + ps[0, 0, :1] * 1e-9
        return h

    os.environ["POINTCLOUDLIB_SA_WINDOW"] = "0"
    print(f"F1 no-window:             {slope(chain_f1, q):.2f} ms")
    os.environ["POINTCLOUDLIB_SA_WINDOW"] = "1"
    print(f"F1 windowed (62% hit):    {slope(chain_f1, q):.2f} ms")

    # 4. P2-equivalent scatter cost is harder to isolate; F1 tells the
    # story for the build+matmul scaling.


if __name__ == "__main__":
    main()
