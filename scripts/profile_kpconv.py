"""Where does the KPConv step go? Plus kNN backend comparison."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    B, N = 16, 1024
    xyz = rng.standard_normal((B, N, 3)).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = jnp.asarray(xyz)
    mask = jnp.ones((B, N), bool)

    from pointcloudlib_tpu.models.kpconv.model import KPCNN, KPConvConfig
    from pointcloudlib_tpu.models.kpconv.pyramid import build_pyramid

    cfg = KPConvConfig(first_subsampling_dl=0.05)

    pyr_fn = jax.jit(lambda x, m: build_pyramid(
        x, m, cfg.first_subsampling_dl, cfg.conv_radius,
        cfg.deform_radius, cfg.architecture, cfg.neighborhood_limits))
    pyr = pyr_fn(xyz, mask)
    print(f"pyramid alone:    {bench(pyr_fn, xyz, mask):.2f} ms")
    print("pyr sizes:", [p.shape[1] for p in pyr.points],
          [i.shape[2] for i in pyr.neighbors])

    model = KPCNN(cfg)
    v = model.init(jax.random.key(0), xyz, training=True)

    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(
        v, x, training=False)))
    print(f"KPCNN fwd (eval): {bench(fwd, v, xyz):.2f} ms")

    def loss(params, bs, x):
        logits, mut = model.apply(
            {"params": params, "batch_stats": bs}, x, training=True,
            mutable=["batch_stats", "intermediates"])
        return jnp.sum(logits)

    g = jax.jit(jax.grad(loss), static_argnums=())
    print(f"KPCNN fwd+bwd:    "
          f"{bench(g, v['params'], v['batch_stats'], xyz):.2f} ms")

    # kNN backends at DGCNN shape
    from pointcloudlib_tpu.ops import geometry
    from pointcloudlib_tpu.ops.pallas.neighbors import knn_pallas

    for c in (3, 256):
        x = jnp.asarray(rng.standard_normal((32, 1024, c)), np.float32)
        f_p = jax.jit(lambda x: knn_pallas(x, x, 20)[1])
        f_x = jax.jit(lambda x: geometry.knn(x, x, 20)[1])
        print(f"knn C={c}: pallas {bench(f_p, x):.2f} ms, "
              f"xla {bench(f_x, x):.2f} ms")


if __name__ == "__main__":
    main()
