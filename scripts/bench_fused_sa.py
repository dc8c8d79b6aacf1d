"""Compile + correctness + speed of the fused SA path on the real TPU.

1. compiled fused_sa_train / eval vs interpret-mode outputs (parity)
2. SA1-shaped fwd+bwd timing vs the unfused path
3. full PointNet++ train step with POINTCLOUDLIB_FUSED_SA on/off
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
    from pointcloudlib_tpu.ops.pallas.fused_sa import (
        SAParams, SAStats, fused_sa_eval, fused_sa_train,
    )

    # --- small-shape compiled-vs-interpret parity
    rng = np.random.default_rng(0)
    b, n, m, k = 2, 256, 64, 32
    c1, c2, c3 = 16, 16, 32
    q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, m, c1)) * .1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
    params = SAParams(
        w2=jnp.asarray(rng.standard_normal((c1, c2)) * .3, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((c2, c3)) * .3, jnp.float32),
        g1=jnp.ones(c1), b1=jnp.zeros(c1),
        g2=jnp.ones(c2), b2=jnp.zeros(c2),
        g3=jnp.ones(c3), b3=jnp.zeros(c3),
    )
    co = jnp.asarray(rng.standard_normal((b, m, c3)), jnp.float32)

    def loss(q, off, params, interp):
        out, stats = fused_sa_train(q, off, idx, params, interp)
        return jnp.sum(out * co), (out, stats)

    (lc, (oc, sc)), gc = jax.value_and_grad(
        lambda *a: loss(*a, False), argnums=(0, 1, 2), has_aux=True
    )(q, off, params)
    (li, (oi, si)), gi = jax.value_and_grad(
        lambda *a: loss(*a, True), argnums=(0, 1, 2), has_aux=True
    )(q, off, params)
    print("fwd out parity:", float(jnp.max(jnp.abs(oc - oi))))
    print("loss parity:", float(lc), float(li))
    for name, a, b_ in [
        ("dq", gc[0], gi[0]), ("doff", gc[1], gi[1]),
        ("dw2", gc[2].w2, gi[2].w2), ("dw3", gc[2].w3, gi[2].w3),
        ("dg1", gc[2].g1, gi[2].g1), ("db1", gc[2].b1, gi[2].b1),
    ]:
        d = float(jnp.max(jnp.abs(a - b_)))
        s = float(jnp.max(jnp.abs(b_))) or 1.0
        print(f"  {name}: max abs diff {d:.3e} (rel {d/s:.2e})")

    ev_c = fused_sa_eval(q, off, idx, params,
                         SAStats(jnp.zeros(c1), jnp.ones(c1),
                                 jnp.zeros(c2), jnp.ones(c2),
                                 jnp.zeros(c3), jnp.ones(c3)))
    ev_i = fused_sa_eval(q, off, idx, params,
                         SAStats(jnp.zeros(c1), jnp.ones(c1),
                                 jnp.zeros(c2), jnp.ones(c2),
                                 jnp.zeros(c3), jnp.ones(c3)),
                         interpret=True)
    print("eval parity:", float(jnp.max(jnp.abs(ev_c - ev_i))))

    # --- SA1-shape timing, fused module vs unfused
    import os

    from pointcloudlib_tpu.nn.layers import (
        FusedSetAbstraction, SetAbstraction,
    )

    B, N = 64, 1024
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    feats = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)

    fused = FusedSetAbstraction(mlp=(64, 64, 128), n_points=512,
                                radius=0.2, n_samples=64)
    # keep the unfused dispatch pinned for the whole comparison
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "0"
    unfused = SetAbstraction(mlp=(64, 64, 128), n_points=512, radius=0.2,
                             n_samples=64)
    fv = fused.init(jax.random.key(0), xyz, feats, True)
    uv = unfused.init(jax.random.key(0), xyz, feats, True)

    def mloss(mod, v, x, f):
        (_, out), _ = mod.apply(v, x, f, True, mutable=["batch_stats"])
        return jnp.sum(out)

    gf = jax.jit(jax.grad(lambda v, x, f: mloss(fused, v, x, f),
                          argnums=(0, 1, 2)))
    gu = jax.jit(jax.grad(lambda v, x, f: mloss(unfused, v, x, f),
                          argnums=(0, 1, 2)))
    print(f"SA1 fused fwd+bwd:   {bench(gf, fv, xyz, feats):.2f} ms")
    print(f"SA1 unfused fwd+bwd: {bench(gu, uv, xyz, feats):.2f} ms")

    ff = jax.jit(lambda v, x, f: mloss(fused, v, x, f))
    uf = jax.jit(lambda v, x, f: mloss(unfused, v, x, f))
    print(f"SA1 fused fwd:       {bench(ff, fv, xyz, feats):.2f} ms")
    print(f"SA1 unfused fwd:     {bench(uf, uv, xyz, feats):.2f} ms")


if __name__ == "__main__":
    main()
