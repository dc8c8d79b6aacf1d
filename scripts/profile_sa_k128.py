"""Pass-level decomposition of the fused SA route at MSG's k=128 scale.

SA1 scale 3: B=32, N=1024, M=512, k=128, mlp [64,96,128]. Times each
internal pallas_call of the train forward plus the backward, and the
in-kernel-bq variant, to find where the 25 ms goes
(scripts/profile_msg.py measured the whole scale).
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
    from pointcloudlib_tpu.ops import ball_query, fps, index_points
    from pointcloudlib_tpu.ops.pallas import fused_sa as fs

    B, N, M, K = 32, 1024, 512, 128
    C1, C2, C3 = 64, 96, 128
    r = 0.4
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)

    idx = jax.jit(lambda x: fps(x, M))(xyz)
    new_xyz = index_points(xyz, idx)
    nidx, cnt = jax.jit(
        lambda c, x: ball_query(c, x, r, K))(new_xyz, xyz)
    cnt_np = np.asarray(cnt)
    print(f"cnt: mean {cnt_np.mean():.1f}, median "
          f"{np.median(cnt_np):.0f}, p90 {np.percentile(cnt_np, 90):.0f},"
          f" max {cnt_np.max()}, frac at cap {np.mean(cnt_np >= K):.2f}")

    q = jnp.asarray(rng.standard_normal((B, N, C1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((B, M, C1)), jnp.float32)
    params = fs.SAParams(
        w2=jnp.asarray(rng.standard_normal((C1, C2)) * 0.1, jnp.float32),
        w3=jnp.asarray(rng.standard_normal((C2, C3)) * 0.1, jnp.float32),
        g1=jnp.ones((C1,)), b1=jnp.zeros((C1,)),
        g2=jnp.ones((C2,)), b2=jnp.zeros((C2,)),
        g3=jnp.ones((C3,)), b3=jnp.zeros((C3,)),
    )

    # --- pass-level timing of the index-based train forward ---
    f1 = jax.jit(lambda q, nidx, off: fs._call_f1(q, nidx, off, False))
    h1, p1 = f1(q, nidx, off)
    print(f"f1 (gather+stats1):    {bench(f1, q, nidx, off):6.2f} ms")

    r_rows = float(B * M * K)
    m1, v1 = fs._moments(p1[0], r_rows)
    st1 = fs._stack_stats(m1, v1, params.g1, params.b1)
    s2 = jax.jit(lambda h1, st1, w2: fs._call_stats2(h1, st1, w2, False))
    p2 = s2(h1, st1, params.w2)
    print(f"stats2:                {bench(s2, h1, st1, params.w2):6.2f} ms")

    m2, v2 = fs._moments(p2[0], r_rows)
    st2 = fs._stack_stats(m2, v2, params.g2, params.b2)
    s3 = jax.jit(lambda h1, st1, st2: fs._call_stats3(
        h1, st1, st2, params.w2, params.w3, False))
    p3 = s3(h1, st1, st2)
    print(f"stats3:                {bench(s3, h1, st1, st2):6.2f} ms")

    m3, v3 = fs._moments(p3[0], r_rows)
    st3 = fs._stack_stats(m3, v3, params.g3, params.b3)
    outp = jax.jit(lambda h1, st1, st2, st3: fs._call_out(
        h1, st1, st2, st3, params.w2, params.w3, False))
    _ = outp(h1, st1, st2, st3)
    print(f"out (max):             {bench(outp, h1, st1, st2, st3):6.2f} ms")

    # --- whole train fwd / fwd+bwd, index route ---
    tf = jax.jit(lambda q, off, nidx: fs.fused_sa_train(
        q, off, nidx, params, False, None, 1)[0])
    print(f"train fwd (given idx): {bench(tf, q, off, nidx):6.2f} ms")

    def loss(q, off, nidx):
        out, _ = fs.fused_sa_train(q, off, nidx, params, False, None, 1)
        return out.sum()

    tb = jax.jit(jax.grad(loss, argnums=(0, 1)))
    print(f"train fwd+bwd:         {bench(tb, q, off, nidx):6.2f} ms")

    # --- slot-capped route (cnt-fed; _kc_variants runtime dispatch) ---
    tfc = jax.jit(lambda q, off, nidx, cnt: fs.fused_sa_train(
        q, off, nidx, params, False, None, 1, cnt)[0])
    print(f"capped fwd (given idx):{bench(tfc, q, off, nidx, cnt):6.2f} ms")

    def lossc(q, off, nidx, cnt):
        out, _ = fs.fused_sa_train(q, off, nidx, params, False, None, 1,
                                   cnt)
        return out.sum()

    tbc = jax.jit(jax.grad(lossc, argnums=(0, 1)))
    print(f"capped fwd+bwd:        {bench(tbc, q, off, nidx, cnt):6.2f} ms")

    # --- gather-capped route (POINTCLOUDLIB_CAP_GATHER: _call_f1 joins
    # the cond chain; new jit objects so the env flip retraces) ---
    import os

    os.environ["POINTCLOUDLIB_CAP_GATHER"] = "1"
    try:
        f1c = jax.jit(lambda q, nidx, off: fs._call_f1(
            q, nidx, off, False, kc=3 * K // 4))
        print(f"f1 capped (kc=3k/4):   {bench(f1c, q, nidx, off):6.2f} ms")
        tfg = jax.jit(lambda q, off, nidx, cnt: fs.fused_sa_train(
            q, off, nidx, params, False, None, 1, cnt)[0])
        print(f"capg fwd (given idx):  {bench(tfg, q, off, nidx, cnt):6.2f} ms")

        def lossg(q, off, nidx, cnt):
            out, _ = fs.fused_sa_train(q, off, nidx, params, False,
                                       None, 1, cnt)
            return out.sum()

        tbg = jax.jit(jax.grad(lossg, argnums=(0, 1)))
        print(f"capg fwd+bwd:          {bench(tbg, q, off, nidx, cnt):6.2f} ms")
    except Exception as e:
        print(f"capg failed: {type(e).__name__}: {e}")
    finally:
        os.environ.pop("POINTCLOUDLIB_CAP_GATHER", None)

    # --- in-kernel bq variant (k=128, currently gated off) ---
    try:
        bf = jax.jit(lambda nx, x, q, off: fs.fused_sa_bq_train(
            nx, x, q, off, params, r, K, False, None, 1)[0])
        print(f"bq_train fwd:          "
              f"{bench(bf, new_xyz, xyz, q, off):6.2f} ms")

        def bloss(nx, x, q, off):
            out, _ = fs.fused_sa_bq_train(
                nx, x, q, off, params, r, K, False, None, 1)
            return out.sum()

        bb = jax.jit(jax.grad(bloss, argnums=(2, 3)))
        print(f"bq_train fwd+bwd:      "
              f"{bench(bb, new_xyz, xyz, q, off):6.2f} ms")
    except Exception as e:
        print(f"bq k=128 failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
