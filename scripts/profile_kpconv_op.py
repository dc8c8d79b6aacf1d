"""Slope-timed decomposition of the KPConv operator at layer-0 scale:
is the cost the gather, the influence einsum, or the output matmul?

B=16, N=M=1024, H=22, K=15, C=64 (first simple block of KPCNN).
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


def slope(make_chain, *args):
    t2 = bench(jax.jit(lambda *a: make_chain(2, *a)), *args)
    t8 = bench(jax.jit(lambda *a: make_chain(8, *a)), *args)
    return (t8 - t2) / 6.0


def main():
    from pointcloudlib_tpu.ops.geometry import index_points

    rng = np.random.default_rng(0)
    B, N, M, H, K, C = 16, 1024, 1024, 22, 15, 64
    pts = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    qpts = pts[:, :M]
    feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    neighb = jnp.asarray(rng.integers(0, N, (B, M, H)), jnp.int32)
    kp = jnp.asarray(rng.standard_normal((K, 3)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, C, C)) * 0.1, jnp.float32)

    def chain_gather(r, feats):
        f = feats
        for _ in range(r):
            g = index_points(f, neighb)            # [B, M, H, C]
            f = f + jnp.mean(g) * 1e-9
        return f

    print(f"gather [B,M,H,C]:        {slope(chain_gather, feats):.2f} ms")

    gpts = index_points(pts, neighb)               # [B, M, H, 3]
    rel = gpts - qpts[:, :, None, :]
    gfeat = index_points(feats, neighb)

    def chain_infl(r, rel):
        x = rel
        out = 0.0
        for _ in range(r):
            d2 = jnp.sum(
                (x[:, :, :, None, :] - kp[None, None, None]) ** 2, -1)
            infl = jnp.maximum(1.0 - jnp.sqrt(d2) / 0.3, 0.0)
            out = out + jnp.mean(infl)
            x = x + out * 1e-9
        return x

    print(f"influence [B,M,H,K]:     {slope(chain_infl, rel):.2f} ms")

    d2 = jnp.sum((rel[:, :, :, None, :] - kp[None, None, None]) ** 2, -1)
    infl = jnp.maximum(1.0 - jnp.sqrt(d2) / 0.3, 0.0)

    def chain_weighted(r, gfeat):
        f = gfeat
        out = 0.0
        for _ in range(r):
            wf = jnp.einsum("bmhk,bmhc->bmkc", infl, f)
            out = jnp.einsum("bmkc,kcd->bmd", wf, w)
            f = f + jnp.mean(out) * 1e-9
        return f

    print(f"weighted+out einsums:    {slope(chain_weighted, gfeat):.2f} ms")

    # full op fwd+bwd
    def full(feats, w):
        gp = index_points(pts, neighb)
        re = gp - qpts[:, :, None, :]
        gf = index_points(feats, neighb)
        dd = jnp.sum((re[:, :, :, None, :] - kp[None, None, None]) ** 2,
                     -1)
        inf = jnp.maximum(1.0 - jnp.sqrt(dd + 1e-12) / 0.3, 0.0)
        wf = jnp.einsum("bmhk,bmhc->bmkc", inf, gf)
        return jnp.sum(jnp.einsum("bmkc,kcd->bmd", wf, w) ** 2)

    g = jax.jit(jax.grad(full, argnums=(0, 1)))
    print(f"full op fwd+bwd (standalone): {bench(g, feats, w):.2f} ms")


if __name__ == "__main__":
    main()
