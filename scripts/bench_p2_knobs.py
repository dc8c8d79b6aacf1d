"""Chained-call timing of the f1/p2 gather+scatter passes vs the
chunk-budget knob (POINTCLOUDLIB_GCHUNK_MB, trace-time).

The r4 pass profile puts p2 (backward scatter) at ~12 ms net of
dispatch at the headline SA1 shape — ~4x its compare+matmul roofline
— with cm = 8 rows/chunk (4096 chunk iterations per step). Bigger
chunks amortize Mosaic loop overhead if VMEM still fits.

Run per arm (fresh process; one TPU job at a time):
    POINTCLOUDLIB_GCHUNK_MB=3 python scripts/bench_p2_knobs.py
    POINTCLOUDLIB_GCHUNK_MB=6 python scripts/bench_p2_knobs.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from bench import _surface_clouds
    from pointcloudlib_tpu.ops import ball_query, fps_gather
    from pointcloudlib_tpu.ops.pallas import fused_sa as F

    mb = os.environ.get("POINTCLOUDLIB_GCHUNK_MB", "3")
    for tag, B, N, M, k, c1, c2, c3, radius in [
        ("headline SA1", 64, 1024, 512, 64, 64, 64, 128, 0.2),
        ("MSG1 scale3", 32, 1024, 512, 128, 64, 96, 128, 0.4),
    ]:
        rng = np.random.default_rng(0)
        xyz_np, _ = _surface_clouds(B, N)
        pts = jnp.asarray(xyz_np)
        ctr = jax.jit(lambda x: fps_gather(x, M))(pts)
        q = jnp.asarray(rng.standard_normal((B, N, c1)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((B, M, c1)), jnp.float32)
        idx, _ = jax.jit(
            lambda c, p: ball_query(c, p, radius, k))(ctr, pts)
        h1 = jnp.asarray(
            rng.standard_normal((B, M, k, c1)), jnp.bfloat16)
        st1 = jnp.asarray(rng.standard_normal((1, 4, c1)), jnp.float32)
        st2 = jnp.asarray(rng.standard_normal((1, 4, c2)), jnp.float32)
        st3 = jnp.asarray(rng.standard_normal((1, 4, c3)), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((c1, c2)), jnp.float32)
        w3 = jnp.asarray(rng.standard_normal((c2, c3)), jnp.float32)
        dout = jnp.asarray(rng.standard_normal((B, M, c3)), jnp.float32)
        us3 = jnp.asarray(rng.standard_normal((1, 2, c3)), jnp.float32)
        us2 = jnp.asarray(rng.standard_normal((1, 2, c2)), jnp.float32)

        jf1 = jax.jit(lambda q, i, o: F._call_f1(q, i, o, False))
        jp2 = jax.jit(
            lambda h, d, i, s1, s2, s3, w2, w3, u3, u2: F._call_p2(
                h, d, i, s1, s2, s3, w2, w3, u3, u2, N, False))
        t1 = bench(jf1, q, idx, off)
        t2 = bench(jp2, h1, dout, idx, st1, st2, st3, w2, w3, us3, us2)
        print(f"GCHUNK_MB={mb} {tag:14s} f1 {t1:6.2f} ms   "
              f"p2 {t2:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
