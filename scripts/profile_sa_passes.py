"""Pass-level timing of the fused-SA pallas calls at model shapes.

VERDICT r4: the step-level profiles say SA layers dominate partseg
(SA1 ~10 ms of a 16.8 ms step) and MSG (k=128 scales = 66 of 93 ms)
— this breaks each fused-SA *pass* out (gather _call_f1 / in-kernel
ball query _call_bqf1 / stats2 / stats3 / out / backward p1 / p2) so
the kernel work targets the real floor, not a guess. Values are
garbage (timing only); chained-call timing amortizes the ~4 ms
dispatch (CLAUDE.md). Surface-cloud geometry for the bq kernel (its
slot loop is occupancy-bounded).

Run on the TPU chip: python scripts/profile_sa_passes.py
"""

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


def profile_shape(tag, B, N, M, k, c1, c2, c3, radius):
    from bench import _surface_clouds
    from pointcloudlib_tpu.ops import ball_query, fps_gather
    from pointcloudlib_tpu.ops.pallas import fused_sa as F

    print(f"== {tag}: B={B} N={N} M={M} k={k} "
          f"c=({c1},{c2},{c3}) r={radius}", flush=True)
    rng = np.random.default_rng(0)
    xyz_np, _ = _surface_clouds(B, N)
    pts = jnp.asarray(xyz_np)
    ctr = jax.jit(lambda x: fps_gather(x, M))(pts)
    q = jnp.asarray(rng.standard_normal((B, N, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, M, c1)), jnp.float32)
    idx, cnt = jax.jit(
        lambda c, p: ball_query(c, p, radius, k))(ctr, pts)
    cnt_np = np.asarray(jax.device_get(cnt))
    print(f"   cnt: mean {cnt_np.mean():6.1f} p95 "
          f"{np.percentile(cnt_np, 95):6.1f} max {cnt_np.max():4d}",
          flush=True)

    t = bench(jax.jit(lambda c, p: ball_query(c, p, radius, k)[0]),
              ctr, pts)
    print(f"   ball_query           {t:7.2f} ms", flush=True)

    jf1 = jax.jit(lambda q, i, o: F._call_f1(q, i, o, False))
    print(f"   f1 (gather+stats1)   {bench(jf1, q, idx, off):7.2f} ms",
          flush=True)

    jbq = jax.jit(lambda c, p, q, o: F._call_bqf1(
        c, p, q, o, radius, k, False))
    print(f"   bqf1 (bq in-gather)  {bench(jbq, ctr, pts, q, off):7.2f} ms",
          flush=True)

    h1 = jnp.asarray(
        rng.standard_normal((B, M, k, c1)), jnp.bfloat16)
    st1 = jnp.asarray(rng.standard_normal((1, 4, c1)), jnp.float32)
    st2 = jnp.asarray(rng.standard_normal((1, 4, c2)), jnp.float32)
    st3 = jnp.asarray(rng.standard_normal((1, 4, c3)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c1, c2)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((c2, c3)), jnp.float32)
    js2 = jax.jit(lambda h, s, w: F._call_stats2(h, s, w, False))
    print(f"   stats2               {bench(js2, h1, st1, w2):7.2f} ms",
          flush=True)
    js3 = jax.jit(lambda h, s1, s2, w2, w3: F._call_stats3(
        h, s1, s2, w2, w3, False))
    print(f"   stats3               "
          f"{bench(js3, h1, st1, st2, w2, w3):7.2f} ms", flush=True)
    jout = jax.jit(lambda h, s1, s2, s3, w2, w3: F._call_out(
        h, s1, s2, s3, w2, w3, False))
    print(f"   out (max-pool)       "
          f"{bench(jout, h1, st1, st2, st3, w2, w3):7.2f} ms",
          flush=True)

    dout = jnp.asarray(rng.standard_normal((B, M, c3)), jnp.float32)
    jp1 = jax.jit(lambda h, d, s1, s2, s3, w2, w3: F._call_p1(
        h, d, s1, s2, s3, w2, w3, False))
    print(f"   p1 (bwd pass 1)      "
          f"{bench(jp1, h1, dout, st1, st2, st3, w2, w3):7.2f} ms",
          flush=True)
    us3 = jnp.asarray(rng.standard_normal((1, 2, c3)), jnp.float32)
    us2 = jnp.asarray(rng.standard_normal((1, 2, c2)), jnp.float32)
    jp2 = jax.jit(
        lambda h, d, i, s1, s2, s3, w2, w3, u3, u2: F._call_p2(
            h, d, i, s1, s2, s3, w2, w3, u3, u2, N, False))
    print(f"   p2 (bwd pass 2)      "
          f"{bench(jp2, h1, dout, idx, st1, st2, st3, w2, w3, us3, us2):7.2f}"
          f" ms", flush=True)


def main():
    # MSG1's dominant k=128 scale (bench B=32; B=64 shown for the
    # step-profile cross-check)
    profile_shape("MSG1 scale3 (B=32)", 32, 1024, 512, 128,
                  64, 96, 128, 0.4)
    # headline SA1
    profile_shape("headline SA1 (B=64)", 64, 1024, 512, 64,
                  64, 64, 128, 0.2)
    # partseg SA1
    profile_shape("partseg SA1 (B=16 N=2048)", 16, 2048, 512, 64,
                  64, 64, 128, 0.2)


if __name__ == "__main__":
    main()
