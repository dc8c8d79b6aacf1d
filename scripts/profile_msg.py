"""MSG step decomposition at the published workload shape.

PointNet++ MSG (networks/cls/pointnet2.py:161-196): SA1 npoint=512,
radii (.1,.2,.4), k (16,32,128), then SA2 npoint=128, radii (.2,.4,.8),
k (32,64,128), then group_all. The k<=64 scales ride the in-kernel
ball-query fused SA; the k=128 scales take separate ball_query + fused
SA with precomputed indices (nn/layers.py fuse_bq gate).

Measures, per scale of SA1/SA2 and for the whole model: fwd and
fwd+bwd times, chained-call slope style (CLAUDE.md: single calls
measure the ~4 ms dispatch, not compute).

Run on the TPU chip: python scripts/profile_msg.py
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
    import optax
    from flax import linen as nn

    from pointcloudlib_tpu.nn.layers import FusedSetAbstraction
    from pointcloudlib_tpu.ops import ball_query, fps, index_points

    B, N = 32, 1024
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    feats = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)

    # --- per-scale: SA1 shapes (M=512 centers over N=1024) ---
    SA1 = [(0.1, 16, [32, 32, 64]), (0.2, 32, [64, 64, 128]),
           (0.4, 128, [64, 96, 128])]
    idx = jax.jit(lambda x: fps(x, 512))(xyz)
    new_xyz = index_points(xyz, idx)

    for r, k, mlp in SA1:
        mod = FusedSetAbstraction(mlp=tuple(mlp), n_points=512,
                                  radius=r, n_samples=k)
        v = mod.init(jax.random.key(0), xyz, feats, training=False,
                     new_xyz=new_xyz, nidx=None)

        def fwd(v, xyz, feats, new_xyz, mod=mod):
            out, _ = mod.apply(v, xyz, feats, training=True,
                               new_xyz=new_xyz, nidx=None,
                               mutable=["batch_stats"])
            return out[1].sum()

        def bwd(v, xyz, feats, new_xyz, mod=mod, fwd=fwd):
            return jax.grad(
                lambda vv: fwd(vv, xyz, feats, new_xyz))(v)

        jf = jax.jit(fwd)
        jb = jax.jit(bwd)
        t_f = bench(jf, v, xyz, feats, new_xyz)
        t_b = bench(jb, v, xyz, feats, new_xyz)
        print(f"SA1 scale r={r} k={k:3d}: fwd {t_f:6.2f} ms   "
              f"fwd+bwd {t_b:6.2f} ms")

    # the separate ball query the k=128 scale pays today
    f_bq = jax.jit(lambda c, x: ball_query(c, x, 0.4, 128)[0])
    print(f"standalone ball_query k=128: {bench(f_bq, new_xyz, xyz):.2f} ms")

    # unfused XLA route for the same k=128 scale, for comparison
    from pointcloudlib_tpu.nn.layers import PointMLP
    from pointcloudlib_tpu.ops import group_points

    r, k, mlp = SA1[2]

    class UnfusedScale(nn.Module):
        @nn.compact
        def __call__(self, xyz, feats, new_xyz, training=False):
            nidx, _ = ball_query(new_xyz, xyz, r, k)
            nidx = jax.lax.stop_gradient(nidx)
            grouped = group_points(xyz, feats, new_xyz, nidx, True)
            h = PointMLP(list(mlp))(grouped, training)
            return jnp.max(h, axis=2)

    umod = UnfusedScale()
    uv = umod.init(jax.random.key(0), xyz, feats, new_xyz,
                   training=False)

    def ufwd(v, xyz, feats, new_xyz):
        out, _ = umod.apply(v, xyz, feats, new_xyz, training=True,
                            mutable=["batch_stats"])
        return out.sum()

    ub = jax.jit(lambda v, x, f, nx: jax.grad(
        lambda vv: ufwd(vv, x, f, nx))(v))
    print(f"unfused XLA scale k=128: fwd "
          f"{bench(jax.jit(ufwd), uv, xyz, feats, new_xyz):.2f} ms   "
          f"fwd+bwd {bench(ub, uv, xyz, feats, new_xyz):.2f} ms")

    # --- full model step ---
    from pointcloudlib_tpu.models import get_cls_model

    model = get_cls_model("pointnet2_msg", n_classes=40)
    v = model.init(jax.random.key(0), xyz[:1], feats[:1], training=False)
    labels = jnp.asarray(np.arange(B) % 40, jnp.int32)

    def loss_fn(params, bs):
        out, upd = model.apply(
            {"params": params, "batch_stats": bs}, xyz, feats,
            training=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})
        l = optax.softmax_cross_entropy_with_integer_labels(
            out, labels).mean()
        return l, upd

    @jax.jit
    def step(params, bs):
        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(params, bs)
        return l, g

    t = bench(step, v["params"], v["batch_stats"], iters=15)
    print(f"full MSG fwd+bwd: {t:.2f} ms -> {B / (t / 1e3):.0f} samples/s")


if __name__ == "__main__":
    main()
