"""Slope-timed pieces of the N=4096 PointNet++ SSG step on SURFACE
clouds (the bench.py profile since round 3 — density tuning measured
on shells overstated wins 2x, twice; DESIGN.md).

Pieces are timed as chained-call slopes (chain r calls, slope between
r=2 and r=8) because single jitted programs measure the ~4 ms tunnel
dispatch, not compute.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def slope(make_chain, *args):
    t2 = bench(jax.jit(lambda *a: make_chain(2, *a)), *args)
    t8 = bench(jax.jit(lambda *a: make_chain(8, *a)), *args)
    return (t8 - t2) / 6.0


def main():
    from pointcloudlib_tpu.ops.dispatch import fps
    from pointcloudlib_tpu.ops.geometry import ball_query
    from pointcloudlib_tpu.ops.pallas.fused_sa import (
        SAParams, fused_sa_train,
    )
    from pointcloudlib_tpu.ops.spatial import canonicalize

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _surface_clouds

    rng = np.random.default_rng(0)
    B, N, M, K = 32, 4096, 512, 64
    x, _ = _surface_clouds(B, N)
    # the trainer canonicalizes at this size — measure what the step sees
    x, _ = canonicalize(jnp.asarray(x))

    def chain_canon(r, x):
        v = x
        for _ in range(r):
            v, _ = canonicalize(v + 1e-9)
        return v

    print(f"canonicalize @N=4096:     {slope(chain_canon, x):.2f} ms")

    def chain_fps(r, x):
        v = x
        for _ in range(r):
            idx = fps(v, M)
            v = v + jnp.mean(idx.astype(jnp.float32)) * 1e-9
        return v

    print(f"fps m=512 @N=4096:        {slope(chain_fps, x):.2f} ms")

    c = x[:, :M]

    def chain_bq(r, x):
        v = x
        for _ in range(r):
            nidx, cnt = ball_query(c, v, 0.2, K)
            v = v + jnp.mean(cnt.astype(jnp.float32)) * 1e-9
        return v

    print(f"ball_query 512x4096 k=64: {slope(chain_bq, x):.2f} ms")

    # occupancy at this shape (drives extraction bound + rung design)
    nidx, cnt = jax.jit(lambda c, x: ball_query(c, x, 0.2, K))(c, x)
    cnt = np.asarray(cnt)
    print(f"  cnt: mean {cnt.mean():.1f}  p50 {np.median(cnt):.0f}  "
          f"max {cnt.max()}  saturated(k)={np.mean(cnt >= K):.0%}")

    # fused SA1 fwd+bwd at the N=4096 shape (windowed kernels)
    c1, c2, c3 = 64, 64, 128
    q = jnp.asarray(rng.standard_normal((B, N, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, M, c1)) * .1, jnp.float32)
    params = SAParams(
        w2=jnp.asarray(rng.standard_normal((c1, c2)) * .2, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((c2, c3)) * .2, jnp.float32),
        g1=jnp.ones(c1), b1=jnp.zeros(c1),
        g2=jnp.ones(c2), b2=jnp.zeros(c2),
        g3=jnp.ones(c3), b3=jnp.zeros(c3),
    )

    def chain_sa(r, q, off, params):
        v = q
        for _ in range(r):
            g = jax.grad(
                lambda q, off, p: jnp.sum(
                    fused_sa_train(q, off, nidx, p, False, None, 1,
                                   jnp.asarray(cnt))[0]),
                argnums=0)(v, off, params)
            v = v + g * 1e-9
        return v

    print(f"fused SA1 fwd+bwd:        {slope(chain_sa, q, off, params):.2f} ms")

    # SA2-scale ball query for context
    def chain_bq2(r, x):
        v = x[:, :512]
        for _ in range(r):
            nidx2, cnt2 = ball_query(v[:, :128], v, 0.4, K)
            v = v + jnp.mean(cnt2.astype(jnp.float32)) * 1e-9
        return v

    print(f"ball_query 128x512 k=64:  {slope(chain_bq2, x):.2f} ms")

    # whole train step for the roof: B=32 N=4096 + normals
    from bench import _bench_cls  # noqa: F401  (shapes doc)


if __name__ == "__main__":
    main()
