"""Slope-timed pieces of the N=4096 PointNet++ step: where do the
49 ms go after windowed gathers?"""

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


def slope(make_chain, *args):
    t2 = bench(jax.jit(lambda *a: make_chain(2, *a)), *args)
    t8 = bench(jax.jit(lambda *a: make_chain(8, *a)), *args)
    return (t8 - t2) / 6.0


def main():
    from pointcloudlib_tpu.ops.dispatch import fps
    from pointcloudlib_tpu.ops.geometry import ball_query

    from pointcloudlib_tpu.ops.spatial import canonicalize

    rng = np.random.default_rng(0)
    B, N, M, K = 32, 4096, 512, 64
    x = rng.standard_normal((B, N, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    # the trainer canonicalizes at this size — measure what the step sees
    x, _ = canonicalize(jnp.asarray(x))

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

    # SA2/SA3-scale pieces for context
    def chain_bq2(r, x):
        v = x[:, :512]
        for _ in range(r):
            nidx, cnt = ball_query(v[:, :128], v, 0.4, K)
            v = v + jnp.mean(cnt.astype(jnp.float32)) * 1e-9
        return v

    print(f"ball_query 128x512 k=64:  {slope(chain_bq2, x):.2f} ms")


if __name__ == "__main__":
    main()
