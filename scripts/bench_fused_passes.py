"""Per-pass timing of the fused SA pipeline.

Usage: bench_fused_passes.py [B N M K]  (default 64 1024 512 64 = SA1)
Indices come from a real ball query on surface clouds so the windowed
kernels (N >= 4096) see realistic index spans."""

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



def main():
    import pointcloudlib_tpu.ops.pallas.fused_sa as fs

    rng = np.random.default_rng(0)
    B, N, M, K = (64, 1024, 512, 64) if len(sys.argv) < 5 else map(
        int, sys.argv[1:5])
    c1, c2, c3 = 64, 64, 128
    q = jnp.asarray(rng.standard_normal((B, N, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, M, c1)) * .1, jnp.float32)
    # real neighbor structure: windowed kernels compute per-chunk spans
    # from the indices, so uniform-random idx would understate them
    from pointcloudlib_tpu.ops.geometry import ball_query
    from pointcloudlib_tpu.ops.spatial import canonicalize
    from bench import _surface_clouds
    xs, _ = _surface_clouds(B, N)
    xs, _ = canonicalize(jnp.asarray(xs))
    from pointcloudlib_tpu.ops.dispatch import fps
    from pointcloudlib_tpu.ops.geometry import index_points
    centers = jax.jit(lambda x: index_points(x, fps(x, M)))(xs)
    idx, _bqcnt = jax.jit(
        lambda c, x: ball_query(c, x, 0.2, K))(centers, xs)
    idx = jnp.asarray(idx)
    params = fs.SAParams(
        w2=jnp.asarray(rng.standard_normal((c1, c2)) * .2, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((c2, c3)) * .2, jnp.float32),
        g1=jnp.ones(c1), b1=jnp.zeros(c1),
        g2=jnp.ones(c2), b2=jnp.zeros(c2),
        g3=jnp.ones(c3), b3=jnp.zeros(c3),
    )
    co = jnp.asarray(rng.standard_normal((B, M, c3)), jnp.float32)
    r = float(B * M * K)

    fwd = jax.jit(lambda q, off, p: fs.fused_sa_train(q, off, idx, p)[0])
    print(f"fused fwd total: {bench(fwd, q, off, params):.2f} ms", flush=True)

    g = jax.jit(jax.grad(
        lambda q, off, p: jnp.sum(fs.fused_sa_train(q, off, idx, p)[0] * co),
        argnums=(0, 1, 2)))
    print(f"fused fwd+bwd:   {bench(g, q, off, params):.2f} ms", flush=True)

    ev = jax.jit(lambda q, off, p: fs.fused_sa_eval(
        q, off, idx, p,
        fs.SAStats(jnp.zeros(c1), jnp.ones(c1), jnp.zeros(c2),
                   jnp.ones(c2), jnp.zeros(c3), jnp.ones(c3))))
    print(f"fused eval:      {bench(ev, q, off, params):.2f} ms", flush=True)

    f1 = jax.jit(lambda q, off: fs._call_f1(q, idx, off, False))
    h1, p1 = f1(q, off)
    print(f"F1 (gather+stat): {bench(f1, q, off):.2f} ms", flush=True)

    st1 = fs._stack_stats(*fs._moments(p1[0], r), params.g1, params.b1)
    f2 = jax.jit(lambda h, st, w: fs._call_stats2(h, st, w, False))
    p2 = f2(h1, st1, params.w2)
    print(f"stats2:           {bench(f2, h1, st1, params.w2):.2f} ms", flush=True)
    st2 = fs._stack_stats(*fs._moments(p2[0], r), params.g2, params.b2)
    f3s = jax.jit(lambda h, s1, s2, w2, w3: fs._call_stats3(h, s1, s2, w2, w3, False))
    p3 = f3s(h1, st1, st2, params.w2, params.w3)
    print(f"stats3:           {bench(f3s, h1, st1, st2, params.w2, params.w3):.2f} ms", flush=True)
    st3 = fs._stack_stats(*fs._moments(p3[0], r), params.g3, params.b3)
    fo = jax.jit(lambda h, s1, s2, s3, w2, w3: fs._call_out(h, s1, s2, s3, w2, w3, False))
    print(f"out:              {bench(fo, h1, st1, st2, st3, params.w2, params.w3):.2f} ms", flush=True)

    dout = co
    p1 = jax.jit(lambda h, d: fs._call_p1(h, d, st1, st2, st3,
                                          params.w2, params.w3, False))
    ps3, vecs, mats = p1(h1, dout)
    print(f"P1 (S3+mats):     {bench(p1, h1, dout):.2f} ms", flush=True)
    dw3, s2, ps3g = fs._combine_p1(ps3, vecs, mats, st3, params.w3, r)
    us3, us2 = ps3g / r, s2 / r
    p2 = jax.jit(lambda h, d: fs._call_p2(h, d, idx, st1, st2, st3,
                                          params.w2, params.w3,
                                          us3, us2, N, False))
    _ = p2(h1, dout)
    print(f"P2 (dW2+scatter): {bench(p2, h1, dout):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
