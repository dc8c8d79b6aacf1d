"""PointNet++ partseg step decomposition at the bench workload shape.

VERDICT r3 item 5: partseg ships at 1.20x — find the floor. Measures
each piece of the B=16 N=2048 train step (models/pointnet2.py:96-131):
SA1 (512 centers, r=0.2, k=64), SA2 (128, 0.4, 64), SA3 group_all,
FP3/FP2/FP1 decoders (three_nn_interpolate + PointMLP), seg head.
fwd and fwd+bwd each, chained-call timing (single calls measure the
~4 ms dispatch — CLAUDE.md).

Run on the TPU chip: python scripts/profile_partseg.py
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


def main():
    from flax import linen as nn

    from pointcloudlib_tpu.nn.layers import (
        FeaturePropagation,
        FusedSetAbstraction,
        PointMLP,
        SetAbstraction,
    )
    from pointcloudlib_tpu.ops import fps, index_points, three_nn_interpolate

    B, N = 16, 2048
    rng = np.random.default_rng(0)

    # SURFACE clouds exactly like bench.py's _setup_seg — occupancy-
    # adaptive kernels must see the bench's density profile (CLAUDE.md
    # trap: shell/Gaussian clouds distort slot counts)
    from bench import _surface_clouds

    xyz_np, _ = _surface_clouds(B, N)
    xyz = jnp.asarray(xyz_np)
    feats = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)

    def run(name, mod, *args, train_kw=None):
        # jit the init: eager runs remote-compile every op individually
        # on this platform (CLAUDE.md) — minutes per module
        v = jax.jit(
            lambda k, *a: mod.init(k, *a, training=False)
        )(jax.random.key(0), *args)

        def fwd(v, *a):
            out = mod.apply(v, *a, training=True,
                            mutable=["batch_stats"],
                            **(train_kw or {}))[0]
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(x) for x in leaves if x.dtype != jnp.int32)

        jf = jax.jit(lambda v, *a: fwd(v, *a))
        jb = jax.jit(lambda v, *a: jax.grad(
            lambda vv: fwd(vv, *a))(v))
        tf = bench(jf, v, *args)
        tb = bench(jb, v, *args)
        print(f"{name:34s} fwd {tf:6.2f} ms   fwd+bwd {tb:7.2f} ms",
              flush=True)
        return jax.jit(
            lambda v, *a: mod.apply(v, *a, training=False)
        )(v, *args)

    # encoder stages at their real shapes
    sa1 = FusedSetAbstraction(mlp=(64, 64, 128), n_points=512,
                              radius=0.2, n_samples=64)
    l1_xyz, l1_f = run("SA1 (2048->512, k=64)", sa1, xyz, feats)
    sa2 = FusedSetAbstraction(mlp=(128, 128, 256), n_points=128,
                              radius=0.4, n_samples=64)
    l2_xyz, l2_f = run("SA2 (512->128, k=64)", sa2, l1_xyz, l1_f)
    sa3 = SetAbstraction(mlp=[256, 512, 1024], n_points=None)
    l3_xyz, l3_f = run("SA3 (group_all)", sa3, l2_xyz, l2_f)

    # decoders
    fp3 = FeaturePropagation([256, 256])
    run("FP3 (128 <- 1)", fp3, l2_xyz, l3_xyz, l2_f, l3_f)
    l2_up = jnp.concatenate(
        [l2_f, jnp.broadcast_to(l3_f, (B, 128, l3_f.shape[-1]))], -1)
    fp2 = FeaturePropagation([256, 128])
    run("FP2 (512 <- 128)", fp2, l1_xyz, l2_xyz, l1_f,
        jnp.zeros((B, 128, 256), jnp.float32))
    fp1 = FeaturePropagation([128, 128, 128])
    ext = jnp.concatenate(
        [jnp.zeros((B, N, 16), jnp.float32), xyz, feats], -1)
    run("FP1 (2048 <- 512)", fp1, xyz, l1_xyz, ext,
        jnp.zeros((B, 512, 128), jnp.float32))

    # the bare 3-NN interpolate at each decoder shape
    for name, q, p, c in [
        ("three_nn 512<-128 C=256", l1_xyz, l2_xyz, 256),
        ("three_nn 2048<-512 C=128", xyz, l1_xyz, 128),
    ]:
        f = jnp.asarray(
            rng.standard_normal((B, p.shape[1], c)), jnp.float32)
        jf = jax.jit(lambda q, p, f: jnp.sum(
            three_nn_interpolate(q, p, f)))
        grad = jax.jit(jax.grad(
            lambda f, q, p: jnp.sum(three_nn_interpolate(q, p, f))))
        tf = bench(jf, q, p, f)
        tb = bench(grad, f, q, p)
        print(f"{name:34s} fwd {tf:6.2f} ms   bwd(feat) {tb:7.2f} ms",
              flush=True)

    # seg head: PointMLP over N=2048 (128->128) + 50-class Dense
    head = PointMLP([128, 128])
    h_in = jnp.asarray(rng.standard_normal((B, N, 128)), jnp.float32)
    run("head PointMLP 128x2 @2048", head, h_in)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            x = nn.Dense(50, dtype=jnp.bfloat16)(x)
            return x.astype(jnp.float32)

    run("final Dense 128->50 @2048", Head(), h_in)


if __name__ == "__main__":
    main()
