"""Second ablation: fps / ball_query / group / maxpool costs at SA1."""

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
    from pointcloudlib_tpu.ops import ball_query, fps, index_points
    from pointcloudlib_tpu.ops.pallas.gather import gather_neighbors

    B, N, M, K = 64, 1024, 512, 64
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)

    f_fps = jax.jit(lambda x: fps(x, M))
    print(f"fps {N}->{M}:        {bench(f_fps, xyz):.2f} ms")
    idx = f_fps(xyz)
    new_xyz = index_points(xyz, idx)

    f_bq = jax.jit(lambda c, x: ball_query(c, x, 0.2, K)[0])
    print(f"ball_query K={K}:   {bench(f_bq, new_xyz, xyz):.2f} ms")
    nidx = f_bq(new_xyz, xyz)

    # group_points (fused xyz||feats gather + recenter), fwd and fwd+bwd
    from pointcloudlib_tpu.ops import group_points

    feats = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    f_gp = jax.jit(
        lambda x, f, c: jnp.sum(group_points(x, f, c, nidx, True)))
    print(f"group fwd:          {bench(f_gp, xyz, feats, new_xyz):.2f} ms")
    g_gp = jax.jit(jax.grad(
        lambda x, f, c: jnp.sum(group_points(x, f, c, nidx, True)),
        argnums=(0, 1, 2)))
    print(f"group fwd+bwd:      {bench(g_gp, xyz, feats, new_xyz):.2f} ms")

    # maxpool over K at SA1 output shape
    h = jnp.asarray(rng.standard_normal((B, M, K, 128)), jnp.float32)
    f_mp = jax.jit(lambda h: jnp.sum(jnp.max(h, axis=2)))
    print(f"maxpool [B,M,K,128] fwd: {bench(f_mp, h):.2f} ms")
    g_mp = jax.jit(jax.grad(lambda h: jnp.sum(jnp.max(h, axis=2))))
    print(f"maxpool fwd+bwd:    {bench(g_mp, h):.2f} ms")

    # gather of a WIDE (64ch) array — does width change cost?
    q64 = jnp.asarray(rng.standard_normal((B, N, 64)), jnp.float32)
    f_g64 = jax.jit(lambda p: jnp.sum(gather_neighbors(p, nidx)))
    print(f"gather64 fwd:       {bench(f_g64, q64):.2f} ms")
    q128 = jnp.asarray(rng.standard_normal((B, N, 128)), jnp.float32)
    f_g128 = jax.jit(lambda p: jnp.sum(gather_neighbors(p, q_idx(nidx))))
    # (reuse same idx)
    f_g128 = jax.jit(lambda p: jnp.sum(gather_neighbors(p, nidx)))
    print(f"gather128 fwd:      {bench(f_g128, q128):.2f} ms")


def q_idx(i):
    return i


if __name__ == "__main__":
    main()
