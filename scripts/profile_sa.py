"""Ablation timing for the PointNet++ step: where do the ms go?

Times (real TPU, device_get fence):
  * full train step (B=64, N=1024)
  * forward only
  * each SA layer fwd+bwd in isolation
  * the grouped-MLP fwd+bwd alone at SA1/SA2 shapes
  * gather fwd+bwd alone
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
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import optax

    from pointcloudlib_tpu.models import get_cls_model
    from pointcloudlib_tpu.train import (
        create_train_state, make_cls_train_step, sgd_momentum, step_decay,
    )

    B, N = 64, 1024
    rng = np.random.default_rng(0)
    # SURFACE clouds exactly like bench.py (r3 moved the bench off
    # sphere-shell Gaussians; occupancy-adaptive kernels must be
    # profiled at the bench's density profile — CLAUDE.md trap)
    from pointcloudlib_tpu.data.synthetic import SyntheticModelNet

    ds = SyntheticModelNet(n_points=N, size=B, train=True, seed=0)
    items = [ds[i] for i in range(B)]
    xyz = jnp.asarray(np.stack([it[0] for it in items]), jnp.float32)
    feats = jnp.asarray(np.stack([it[1] for it in items]), jnp.float32)
    label = jnp.asarray(np.arange(B) % 40, jnp.int32)
    batch = {"xyz": xyz, "feats": feats, "label": label}

    model = get_cls_model("pointnet2", n_classes=40)
    key = jax.random.key(0)
    tx = sgd_momentum(step_decay(0.1), momentum=0.9)
    state = create_train_state(model, key, xyz[:1], feats[:1], tx)
    step = make_cls_train_step(model, mesh=None)

    # full step — non-donated copy each iter would skew; run the real one
    s = state
    def full(s0):
        s1, m = step(s0, batch, key)
        return m["loss"]
    # donation: rebuild state each call is costly; time the loop directly
    for _ in range(3):
        s, m = step(s, batch, key)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        s, m = step(s, batch, key)
    jax.device_get(m["loss"])
    full_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"full train step: {full_ms:.2f} ms  "
          f"({B / (full_ms / 1e3):.0f} samples/s)")

    # forward only
    variables = s.variables()
    fwd = jax.jit(lambda v, x, f: model.apply(v, x, f, training=False))
    print(f"fwd (eval mode): {bench(fwd, variables, xyz, feats):.2f} ms")

    # train-mode fwd (batch stats)
    fwd_t = jax.jit(lambda v, x, f: jnp.sum(model.apply(
        v, x, f, training=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)})[0]))
    print(f"fwd (train mode): {bench(fwd_t, variables, xyz, feats):.2f} ms")

    # SA layers in isolation (fwd+bwd)
    from pointcloudlib_tpu.nn.layers import SetAbstraction

    shapes = [
        ("SA1", 512, 0.2, 64, (64, 64, 128), N, 3),
        ("SA2", 128, 0.4, 64, (128, 128, 256), 512, 128),
        ("SA3", None, None, None, (256, 512, 1024), 128, 256),
    ]
    # per-stage inputs carry the REAL geometry (occupancy-adaptive
    # kernels: Gaussian stand-ins would distort slot counts)
    from pointcloudlib_tpu.ops import fps_gather

    stage_xyz = {
        1024: xyz,
        512: jax.jit(lambda x: fps_gather(x, 512))(xyz),
        128: jax.jit(lambda x: fps_gather(x, 128))(
            jax.jit(lambda x: fps_gather(x, 512))(xyz)),
    }
    for name, m_, r_, k_, mlp, n_in, c_in in shapes:
        sa = SetAbstraction(mlp=mlp, n_points=m_, radius=r_, n_samples=k_)
        x_in = stage_xyz[n_in]
        f_in = jnp.asarray(
            rng.standard_normal((B, n_in, c_in)), jnp.float32)
        v = jax.jit(lambda k, x, f: sa.init(k, x, f, True))(
            jax.random.key(0), x_in, f_in)

        def loss(v, x, f):
            out, _ = sa.apply(v, x, f, True, mutable=["batch_stats"])
            return jnp.sum(out[1])

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        print(f"{name} fwd+bwd: {bench(g, v, x_in, f_in):.2f} ms")
        fo = jax.jit(loss)
        print(f"{name} fwd:     {bench(fo, v, x_in, f_in):.2f} ms")

    # grouped MLP alone at SA1 shape (the fusion target)
    from pointcloudlib_tpu.nn.layers import PointMLP

    for name, m_, k_, c0, mlp in [("MLP@SA1", 512, 64, 6, (64, 64, 128)),
                                  ("MLP@SA2", 128, 64, 131, (128, 128, 256))]:
        g_in = jnp.asarray(
            rng.standard_normal((B, m_, k_, c0)), jnp.float32)
        pm = PointMLP(mlp)
        v = jax.jit(lambda k, x: pm.init(k, x, True))(
            jax.random.key(0), g_in)

        def mloss(v, x):
            out, _ = pm.apply(v, x, True, mutable=["batch_stats"])
            return jnp.sum(jnp.max(out, axis=2))

        gm = jax.jit(jax.grad(mloss, argnums=(0, 1)))
        print(f"{name} fwd+bwd: {bench(gm, v, g_in):.2f} ms")

    # gather alone at SA1 shape
    from pointcloudlib_tpu.ops.pallas.gather import gather_neighbors

    idx = jnp.asarray(rng.integers(0, N, (B, 512, 64)), jnp.int32)
    pts6 = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)

    def gloss(p):
        return jnp.sum(gather_neighbors(p, idx))

    gg = jax.jit(jax.grad(gloss))
    print(f"gather6 fwd+bwd @SA1: {bench(gg, pts6):.2f} ms")
    gf = jax.jit(gloss)
    print(f"gather6 fwd @SA1:     {bench(gf, pts6):.2f} ms")


if __name__ == "__main__":
    main()
