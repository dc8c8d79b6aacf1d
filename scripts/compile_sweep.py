"""Compile-and-run sweep: every bench workload's REAL train step
(forward+backward, the exact objects bench.py times) is lowered,
compiled, and run for one step on the chip — plus a fast kernel-level
pre-pass over hand-picked shapes that localizes a failure to a single
Pallas entry point before the whole-program pass names the workload.

The workload pass is derived from bench.WORKLOADS via
bench.workload_setup(), not a hand-kept shape list: rounds 2 and 3
each shipped a compile class the hand-picked list missed (gate-keyed
jit caches; the pointcnn-partseg gather backward at f32[16,2048,8,131]
— VERDICT r3 #7). If this sweep passes, bench.py cannot fail to
compile.

Run on the real chip:
  python scripts/compile_sweep.py              # kernels + all workloads
  python scripts/compile_sweep.py --kernels    # kernel pre-pass only
  python scripts/compile_sweep.py pointcnn     # workloads matching substring
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sweep_sa():
    from pointcloudlib_tpu.ops.pallas.fused_sa import (
        SAParams, SAStats, fused_sa_eval, fused_sa_train,
    )

    # (B, N, M, K, C1, C2, C3) — SSG SA1/SA2, MSG scales, headline N=4096.
    # The N=4096 shape compiles the WINDOWED kernels (default gate);
    # "win" entries force the window path at gated-off sizes too.
    shapes = [
        (8, 1024, 512, 64, 64, 64, 128),      # SA1
        (8, 512, 128, 64, 128, 128, 256),     # SA2
        (4, 4096, 512, 64, 64, 64, 128),      # SA1 @ N=4096 (windowed)
        (8, 1024, 512, 16, 32, 32, 64),       # MSG scale K=16
        (8, 1024, 512, 128, 64, 96, 128),     # MSG scale K=128
        (8, 2048, 512, 32, 64, 64, 128),      # partseg-ish
        ("win", 8, 1024, 512, 64, 64, 64, 128),   # SA1, forced window
        ("win", 8, 512, 128, 64, 128, 128, 256),  # SA2, forced window
    ]
    rng = np.random.default_rng(0)
    for shape in shapes:
        import os

        forced = shape[0] == "win"
        if forced:
            os.environ["POINTCLOUDLIB_SA_WINDOW"] = "1"
            shape = shape[1:]
        (b, n, m, k, c1, c2, c3) = shape
        q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, m, c1)) * .1,
                          jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
        params = SAParams(
            w2=jnp.asarray(rng.standard_normal((c1, c2)) * .2,
                           jnp.float32),
            w3=jnp.asarray(rng.standard_normal((c2, c3)) * .2,
                           jnp.float32),
            g1=jnp.ones(c1), b1=jnp.zeros(c1),
            g2=jnp.ones(c2), b2=jnp.zeros(c2),
            g3=jnp.ones(c3), b3=jnp.zeros(c3),
        )
        g = jax.jit(jax.grad(
            lambda q, off, p: jnp.sum(
                fused_sa_train(q, off, idx, p)[0]), argnums=(0, 1, 2)))
        out = g(q, off, params)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        # cnt-fed: lax.cond compiles EVERY slot-cap rung (_kc_variants)
        cnt = jnp.asarray(rng.integers(1, k + 1, (b, m)), jnp.int32)
        gc = jax.jit(jax.grad(
            lambda q, off, p: jnp.sum(
                fused_sa_train(q, off, idx, p, False, None, 1,
                               cnt)[0]), argnums=(0, 1, 2)))
        out = gc(q, off, params)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ev = fused_sa_eval(q, off, idx, params, SAStats(
            jnp.zeros(c1), jnp.ones(c1), jnp.zeros(c2), jnp.ones(c2),
            jnp.zeros(c3), jnp.ones(c3)))
        jax.device_get(ev.ravel()[0])
        if forced:
            os.environ.pop("POINTCLOUDLIB_SA_WINDOW", None)
        print(f"sa ok  B={b} N={n} M={m} K={k} C=({c1},{c2},{c3})"
              + (" [windowed]" if forced else ""), flush=True)


def sweep_edge():
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        fused_edge2_conv, fused_edge_conv,
    )

    rng = np.random.default_rng(1)
    # 1-layer: DGCNN cls shapes (k=20) incl. the widest C'=256
    for (b, n, k, c, f) in [(8, 1024, 20, 3, 64), (8, 1024, 20, 128, 256),
                            (4, 2048, 40, 64, 64)]:
        q = jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, n, f)) * .1, jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
        gam = jnp.ones(f); bet = jnp.zeros(f)
        g = jax.jit(jax.grad(
            lambda q, off, g_, b_: jnp.sum(
                fused_edge_conv(q, off, idx, g_, b_)[0]),
            argnums=(0, 1, 2, 3)))
        out = g(q, off, gam, bet)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        print(f"edge ok  B={b} N={n} K={k} F={f}", flush=True)
    # 2-layer partseg pair at k=40 N=2048
    b, n, k, f1, f2 = 4, 2048, 40, 64, 64
    q = jnp.asarray(rng.standard_normal((b, n, f1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, n, f1)) * .1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, n, k)), jnp.int32)
    w2 = jnp.asarray(rng.standard_normal((f1, f2)) * .2, jnp.float32)
    g = jax.jit(jax.grad(
        lambda q, off, w2: jnp.sum(fused_edge2_conv(
            q, off, idx, w2, jnp.ones(f1), jnp.zeros(f1),
            jnp.ones(f2), jnp.zeros(f2))[0]), argnums=(0, 1, 2)))
    out = g(q, off, w2)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"edge2 ok  B={b} N={n} K={k} F=({f1},{f2})", flush=True)

    # in-kernel-kNN variants (round-3): train + eval at model shapes
    from pointcloudlib_tpu.ops.pallas.fused_edge import (
        EdgeStats, fused_edge_conv_knn, fused_edge_eval_knn,
        fused_edge2_conv_knn,
    )

    for (b, n, k, c, f) in [(8, 1024, 20, 3, 64),
                            (8, 1024, 20, 256, 256),
                            (4, 2048, 40, 6, 64)]:
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, n, f)) * .1,
                          jnp.float32)
        gam = jnp.ones(f)
        bet = jnp.zeros(f)
        g = jax.jit(jax.grad(
            lambda q, off, g_, b_, x=x, k=k: jnp.sum(
                fused_edge_conv_knn(x, q, off, g_, b_, k)[0]),
            argnums=(0, 1, 2, 3)))
        out = g(q, off, gam, bet)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ev = fused_edge_eval_knn(
            x, q, off, gam, bet, EdgeStats(jnp.zeros(f), jnp.ones(f)),
            k)
        jax.device_get(ev.ravel()[0])
        print(f"edge-knn ok  B={b} N={n} K={k} C={c} F={f}",
              flush=True)
    # q/off/w2 still hold the 2-layer pair shapes from above
    x = jnp.asarray(rng.standard_normal((4, 2048, 64)), jnp.float32)
    g = jax.jit(jax.grad(
        lambda q, off, w2: jnp.sum(fused_edge2_conv_knn(
            x, q, off, w2, jnp.ones(f1), jnp.zeros(f1),
            jnp.ones(f2), jnp.zeros(f2), 40)[0]), argnums=(0, 1, 2)))
    out = g(q, off, w2)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print("edge2-knn ok  B=4 N=2048 K=40", flush=True)


def sweep_gather_odd():
    """KPConv's data-calibrated caps produce non-power-of-two shapes
    (e.g. M=496, K=12) — the class that exposed the sublane-tile bug."""
    from pointcloudlib_tpu.ops.pallas.gather import gather_neighbors

    rng = np.random.default_rng(2)
    for (b, n, m, k, c) in [(16, 512, 496, 12, 64), (16, 1024, 984, 22, 3),
                            (8, 256, 248, 35, 128), (8, 128, 120, 41, 256)]:
        pts = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
        g = jax.jit(jax.grad(lambda p: jnp.sum(gather_neighbors(p, idx))))
        jax.device_get(g(pts).ravel()[0])
        print(f"gather ok  B={b} N={n} M={m} K={k} C={c}", flush=True)


def sweep_bq():
    """In-kernel ball-query route (the headline path at k <= 64) —
    its tail passes slot-cap via the kernel's own cnt output."""
    from pointcloudlib_tpu.ops.pallas.fused_sa import (
        SAParams, SAStats, fused_sa_bq_eval, fused_sa_bq_train,
    )

    rng = np.random.default_rng(2)
    # (B, N, M, K, C1, C2, C3, r) — SSG SA1/SA2, MSG small scales,
    # plus the small-N/m>n CLI shape: small n inflates _gchunk's
    # chunks and caught the slot-major p2 scoped-VMEM overflow that
    # every bench shape missed (r5; docs/DESIGN.md "Slot-major tails:
    # chip validation")
    for (b, n, m, k, c1, c2, c3, r) in [
        (8, 1024, 512, 32, 64, 64, 128, 0.2),
        (8, 512, 128, 64, 128, 128, 256, 0.4),
        (8, 1024, 512, 16, 32, 32, 64, 0.1),
        (8, 256, 512, 64, 64, 64, 128, 0.4),
    ]:
        xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
        xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
        xyz = jnp.asarray(xyz)
        new_xyz = xyz[:, :m]
        q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, m, c1)) * .1,
                          jnp.float32)
        params = SAParams(
            w2=jnp.asarray(rng.standard_normal((c1, c2)) * .2,
                           jnp.float32),
            w3=jnp.asarray(rng.standard_normal((c2, c3)) * .2,
                           jnp.float32),
            g1=jnp.ones(c1), b1=jnp.zeros(c1),
            g2=jnp.ones(c2), b2=jnp.zeros(c2),
            g3=jnp.ones(c3), b3=jnp.zeros(c3),
        )
        g = jax.jit(jax.grad(
            lambda q, off, p: jnp.sum(fused_sa_bq_train(
                new_xyz, xyz, q, off, p, r, k)[0]), argnums=(0, 1, 2)))
        out = g(q, off, params)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        stats = SAStats(
            m1=jnp.zeros(c1), v1=jnp.ones(c1), m2=jnp.zeros(c2),
            v2=jnp.ones(c2), m3=jnp.zeros(c3), v3=jnp.ones(c3))
        ev = jax.jit(lambda q, off, p: fused_sa_bq_eval(
            new_xyz, xyz, q, off, p, stats, r, k))(q, off, params)
        jax.device_get(ev.ravel()[0])
        print(f"bq ok  B={b} N={n} M={m} K={k} C=({c1},{c2},{c3})",
              flush=True)


def sweep_capped_gather():
    """POINTCLOUDLIB_CAP_GATHER=1: the gather/eval passes join the
    slot-cap cond chain (_k_f1/_k_eval with e > 0 — value-level lane
    slicing of idx + replica-fill concat are the Mosaic-risk ops)."""
    import os

    from pointcloudlib_tpu.ops.pallas.fused_sa import (
        SAParams, SAStats, fused_sa_eval, fused_sa_train,
    )

    rng = np.random.default_rng(3)
    # rungs are opt-in since round 3; without them _kc_variants returns
    # [k] and the capped (e > 0) kernels would never compile
    os.environ["POINTCLOUDLIB_SA_RUNGS"] = "1"
    os.environ["POINTCLOUDLIB_CAP_GATHER"] = "1"
    try:
        # SA1, MSG k=128, windowed N=4096
        for (b, n, m, k, c1, c2, c3) in [
            (8, 1024, 512, 64, 64, 64, 128),
            (8, 1024, 512, 128, 64, 96, 128),
            (4, 4096, 512, 64, 64, 64, 128),
        ]:
            q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
            off = jnp.asarray(rng.standard_normal((b, m, c1)) * .1,
                              jnp.float32)
            idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
            cnt = jnp.asarray(rng.integers(1, k + 1, (b, m)), jnp.int32)
            params = SAParams(
                w2=jnp.asarray(rng.standard_normal((c1, c2)) * .2,
                               jnp.float32),
                w3=jnp.asarray(rng.standard_normal((c2, c3)) * .2,
                               jnp.float32),
                g1=jnp.ones(c1), b1=jnp.zeros(c1),
                g2=jnp.ones(c2), b2=jnp.zeros(c2),
                g3=jnp.ones(c3), b3=jnp.zeros(c3),
            )
            g = jax.jit(jax.grad(
                lambda q, off, p: jnp.sum(
                    fused_sa_train(q, off, idx, p, False, None, 1,
                                   cnt)[0]), argnums=(0, 1, 2)))
            out = g(q, off, params)
            jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            ev = jax.jit(lambda q, off: fused_sa_eval(
                q, off, idx, params, SAStats(
                    jnp.zeros(c1), jnp.ones(c1), jnp.zeros(c2),
                    jnp.ones(c2), jnp.zeros(c3), jnp.ones(c3)),
                False, cnt))(q, off)
            jax.device_get(ev.ravel()[0])
            print(f"capg ok  B={b} N={n} M={m} K={k}", flush=True)
    finally:
        os.environ.pop("POINTCLOUDLIB_CAP_GATHER", None)
        os.environ.pop("POINTCLOUDLIB_SA_RUNGS", None)


def sweep_workloads(filters=()):
    """Lower + compile + run ONE step of each bench workload's actual
    train step. Catches everything bench.py can hit: Mosaic scoped-VMEM
    OOMs (compile-time), XLA HBM OOMs and runtime faults (the single
    executed step). Serial — one TPU program in flight at a time."""
    import bench

    failed = []
    for metric, _kind, _args, _iters in bench.WORKLOADS:
        if filters and not any(f in metric for f in filters):
            continue
        t0 = time.perf_counter()
        try:
            step, state, sharded, key = bench.workload_setup(metric)
            compiled = step.lower(state, sharded, key).compile()
            t_compile = time.perf_counter() - t0
            _state, metrics = compiled(state, sharded, key)
            loss = float(jax.device_get(metrics["loss"]))
            assert np.isfinite(loss), f"non-finite loss {loss}"
            print(f"workload ok  {metric}  compile={t_compile:.1f}s "
                  f"loss={loss:.3f}", flush=True)
        except Exception as e:
            failed.append(metric)
            print(f"workload FAIL  {metric}: "
                  f"{' '.join(str(e).split())[:300]}", flush=True)
    # eval (serving) rows are distinct compile classes (rounds +
    # running-max kernels, slot-blocked bq eval, no grad) — r5 shipped
    # them in bench.py, so the sweep must cover them too. One full
    # timed call each via bench's own harness (iters=1).
    for metric, kind, setup_args, _iters in bench.EVAL_WORKLOADS:
        if filters and not any(f in metric for f in filters):
            continue
        t0 = time.perf_counter()
        try:
            fn = (bench._bench_cls_eval if kind == "cls"
                  else bench._bench_seg_eval)
            fn(*setup_args, iters=1, warmup=1)
            print(f"workload ok  {metric}  "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as e:
            failed.append(metric)
            print(f"workload FAIL  {metric}: "
                  f"{' '.join(str(e).split())[:300]}", flush=True)
    if failed:
        print(f"sweep FAILED: {failed}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    from pointcloudlib_tpu.utils.compile_cache import enable_compile_cache

    # NOTE: the cache serves sweep purpose too — a VMEM/tiling failure
    # is a compile-time property, and cache HITS mean the program
    # compiled before; only new compile classes pay full price.
    enable_compile_cache()
    argv = sys.argv[1:]
    kernels_only = "--kernels" in argv
    filters = tuple(a for a in argv if not a.startswith("--"))
    if not filters:  # kernel pre-pass (fast, localizes failures)
        sweep_sa()
        sweep_edge()
        sweep_gather_odd()
        sweep_bq()
        sweep_capped_gather()
    if not kernels_only:
        sweep_workloads(filters)
    print("sweep complete")
