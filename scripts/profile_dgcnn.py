"""DGCNN cls step decomposition (B=32, N=1024, k=20), slope-timed
where dispatch latency would skew (CLAUDE.md: ~4 ms/program tunnel
dispatch)."""

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
    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.train import (
        create_train_state, make_cls_train_step, sgd_momentum, step_decay,
    )

    B, N = 32, 1024
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    label = jnp.asarray(np.arange(B) % 40, jnp.int32)
    batch = {"xyz": xyz, "label": label}

    model = get_cls_model("dgcnn", n_classes=40)
    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(model, key, xyz[:1], None, tx)
    step = make_cls_train_step(model, mesh=None)

    s = state
    for _ in range(3):
        s, m = step(s, batch, key)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        s, m = step(s, batch, key)
    jax.device_get(m["loss"])
    full_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"full train step: {full_ms:.2f} ms ({B/(full_ms/1e3):.0f} sa/s)")

    variables = s.variables()
    fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
    print(f"fwd (eval): {bench(fwd, variables, xyz):.2f} ms")

    fwd_t = jax.jit(lambda v, x: jnp.sum(model.apply(
        v, x, training=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)})[0]))
    print(f"fwd (train): {bench(fwd_t, variables, xyz):.2f} ms")

    # train fwd+bwd minus the 4 kNN calls: freeze the graphs by feeding
    # precomputed indices through a model surgery — instead, time the
    # kNN chain alone and subtract (slope-timed).
    from pointcloudlib_tpu.ops import geometry

    def knn_chain(x, r, k=20):
        f = x
        for _ in range(r):
            _, idx = geometry.knn(f, f, k)
            f = f + jnp.mean(idx.astype(jnp.float32)) * 1e-6
        return f

    feat = jnp.asarray(rng.standard_normal((B, N, 64)), jnp.float32)
    t2 = bench(jax.jit(lambda x: knn_chain(x, 2)), feat)
    t8 = bench(jax.jit(lambda x: knn_chain(x, 8)), feat)
    print(f"knn/call (slope): {(t8 - t2) / 6:.2f} ms -> x4 = "
          f"{(t8 - t2) / 6 * 4:.1f} ms of the step")

    # fused EdgeConv layers fwd+bwd at each DGCNN shape
    import pointcloudlib_tpu.ops.pallas.fused_edge as fe

    have = [n for n in ("fused_edge_train", "fused_edge2_train")
            if hasattr(fe, n)]
    print("fused_edge entry points:", have)


if __name__ == "__main__":
    main()
