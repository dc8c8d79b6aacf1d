"""MSG step decomposition at the bench workload shape (B=64, N=1024).

VERDICT r3 item 4: MSG ships at 1.29x — the three grouping scales
query the SAME centers against the SAME cloud with three radii, so the
[M,N] distance work is a shared-candidate for a multi-radius kernel.
This measures where the step actually goes: full step, each MSG layer
(fwd / fwd+bwd), each scale in isolation, and the k=128 scale's
separate ball_query pass. Surface clouds like bench.py (CLAUDE.md:
occupancy-adaptive kernels must see the bench density profile).

Run on the TPU chip (one TPU job at a time):
    python scripts/profile_msg.py
Gate A/Bs ride env vars read at trace time — fresh process per arm:
    POINTCLOUDLIB_BQ_KMAX=128 python scripts/profile_msg.py
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
    from bench import _surface_clouds
    from pointcloudlib_tpu.nn.layers import (
        FusedSetAbstraction,
        SetAbstractionMSG,
    )
    from pointcloudlib_tpu.ops import ball_query, fps_gather

    B, N = 64, 1024
    rng = np.random.default_rng(0)
    xyz_np, normals = _surface_clouds(B, N)
    xyz = jnp.asarray(xyz_np)
    feats = jnp.asarray(normals)

    def run(name, mod, *args):
        # jit init/apply: eager remote-compiles every op (CLAUDE.md)
        v = jax.jit(
            lambda k, *a: mod.init(k, *a, training=False)
        )(jax.random.key(0), *args)

        def fwd(v, *a):
            out = mod.apply(v, *a, training=True,
                            mutable=["batch_stats"])[0]
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(x) for x in leaves
                       if x.dtype != jnp.int32)

        jf = jax.jit(lambda v, *a: fwd(v, *a))
        jb = jax.jit(lambda v, *a: jax.grad(lambda vv: fwd(vv, *a))(v))
        tf = bench(jf, v, *args)
        tb = bench(jb, v, *args)
        print(f"{name:40s} fwd {tf:7.2f} ms   fwd+bwd {tb:8.2f} ms",
              flush=True)
        return jax.jit(
            lambda v, *a: mod.apply(v, *a, training=False)
        )(v, *args)

    # layer 1 at its real input, layer 2 at layer-1's output geometry
    msg1 = SetAbstractionMSG(
        n_points=512, radii=[0.1, 0.2, 0.4], n_samples=[16, 32, 128],
        mlps=[[32, 32, 64], [64, 64, 128], [64, 96, 128]])
    l1_xyz, l1_f = run("MSG1 (1024->512, k=16/32/128)", msg1, xyz, feats)
    msg2 = SetAbstractionMSG(
        n_points=128, radii=[0.2, 0.4, 0.8], n_samples=[32, 64, 128],
        mlps=[[64, 64, 128], [128, 128, 256], [128, 128, 256]])
    run("MSG2 (512->128, k=32/64/128)", msg2, l1_xyz, l1_f)

    # each scale in isolation (precomputed centers so FPS is excluded)
    centers1 = jax.jit(lambda x: fps_gather(x, 512))(xyz)
    centers2 = jax.jit(lambda x: fps_gather(x, 128))(l1_xyz)
    for lname, src, f_in, ctr, scales in [
        ("MSG1", xyz, feats, centers1,
         [(0.1, 16, (32, 32, 64)), (0.2, 32, (64, 64, 128)),
          (0.4, 128, (64, 96, 128))]),
        ("MSG2", l1_xyz, l1_f, centers2,
         [(0.2, 32, (64, 64, 128)), (0.4, 64, (128, 128, 256)),
          (0.8, 128, (128, 128, 256))]),
    ]:
        for r, k, mlp in scales:
            sa = FusedSetAbstraction(
                mlp=mlp, n_points=ctr.shape[1], radius=r, n_samples=k)
            # mirror the MSG call: precomputed centers, nidx=None
            v = jax.jit(
                lambda k, s, fi, c, sa=sa: sa.init(
                    k, s, fi, False, new_xyz=c)
            )(jax.random.key(0), src, f_in, ctr)

            def fwd(v, s, fi, c, sa=sa):
                out = sa.apply(v, s, fi, True, new_xyz=c,
                               mutable=["batch_stats"])[0]
                return jnp.sum(out[1])

            jf = jax.jit(fwd)
            jb = jax.jit(jax.grad(fwd, argnums=1))
            tf = bench(jf, v, src, f_in, ctr)
            # bwd wrt feats (what the step pays; params similar)
            tb = bench(jb, v, src, f_in, ctr)
            print(f"{lname} scale r={r:<4} k={k:<3}"
                  f"{'':17s} fwd {tf:7.2f} ms   fwd+bwd {tb:8.2f} ms",
                  flush=True)
        # cnt statistics per radius — what bounds the slot loops
        for r, k, _ in scales:
            _, cnt = jax.jit(
                lambda c, s, r=r, k=k: ball_query(c, s, r, k))(ctr, src)
            cnt = np.asarray(jax.device_get(cnt))
            print(f"{lname} r={r:<4} k={k:<3} cnt: max {cnt.max():4d} "
                  f"mean {cnt.mean():7.1f} p95 "
                  f"{np.percentile(cnt, 95):7.1f}", flush=True)

    # the k=128 scale's standalone ball_query (the non-fused pre-pass)
    jbq = jax.jit(lambda c, s: ball_query(c, s, 0.4, 128)[0])
    print(f"{'ball_query r=0.4 k=128 (MSG1 pre-pass)':40s} "
          f"fwd {bench(jbq, centers1, xyz):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
