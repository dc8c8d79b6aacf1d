"""True per-call kNN cost at DGCNN shapes, free of tunnel dispatch.

Chains R data-dependent kNN calls inside ONE jitted program and fits
the slope between R=2 and R=8 — the ~4 ms/program dispatch latency of
the tunneled axon platform cancels out (CLAUDE.md: standalone
micro-benchmarks measure dispatch, not compute).
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
    from pointcloudlib_tpu.ops import geometry

    def knn_dispatch(q, p, k):
        _, idx = geometry.knn(q, p, k)  # routes to knn_pallas on TPU
        return idx

    rng = np.random.default_rng(0)
    B, N = 32, 1024

    for label, k, c in [("dgcnn l1", 20, 64), ("dgcnn l3", 20, 128),
                        ("dgcnn l4", 20, 256), ("partseg", 40, 64)]:
        x = jnp.asarray(rng.standard_normal((B, N, c)), jnp.float32)

        def chain(x, r):
            f = x
            for _ in range(r):
                idx = knn_dispatch(f, f, k)
                # data dependency: perturb features by the mean index
                f = f + (jnp.mean(idx.astype(jnp.float32)) * 1e-6)
            return f

        t2 = bench(jax.jit(lambda x: chain(x, 2)), x)
        t8 = bench(jax.jit(lambda x: chain(x, 8)), x)
        per = (t8 - t2) / 6.0
        print(f"{label:10s} k={k:2d} C={c:3d}: {per:.2f} ms/call "
              f"(chain2 {t2:.2f}, chain8 {t8:.2f})")

    # XLA comparison at the DGCNN l4 shape
    x = jnp.asarray(rng.standard_normal((B, N, 256)), jnp.float32)

    def chain_xla(x, r):
        f = x
        for _ in range(r):
            d = geometry.square_distance(f, f)
            _, idx = jax.lax.top_k(-d, 20)
            f = f + (jnp.mean(idx.astype(jnp.float32)) * 1e-6)
        return f

    t2 = bench(jax.jit(lambda x: chain_xla(x, 2)), x)
    t8 = bench(jax.jit(lambda x: chain_xla(x, 8)), x)
    print(f"XLA topk   k=20 C=256: {(t8 - t2) / 6.0:.2f} ms/call "
          f"(chain2 {t2:.2f}, chain8 {t8:.2f})")


if __name__ == "__main__":
    main()
