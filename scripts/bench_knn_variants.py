"""Empirical shootout of kNN selection-round variants (B=32, N=1024,
k=20) — chained-call slope timing, dispatch-free.

Variants:
  base     — production kernel (argmin + min + mask-update per round)
  noval    — skip the d2-value output (set callers only need indices)
  packed   — one reduction per round: for d2 >= 0, bitcast(f32) is
             order-monotone; key = (d2_bits | 0) then min; index from
             one eq-extract. Ties at identical f32 d2 break to the
             LOWER index via the eq-extract min, same as base.
  thresh   — no d2cur rewrite: carry (lastval, lastidx), candidate
             mask per round.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _dist2(c, p):
    c2 = jnp.sum(c * c, axis=1, keepdims=True)
    p2 = jnp.sum(p * p, axis=1, keepdims=True)
    inner = lax.dot_general(c, p, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.maximum(c2 - 2.0 * inner + p2.T, 0.0)


# ---------------------------------------------------------------- variants


def _k_base(c_ref, p_ref, idx_ref, *, k):
    mt, n = c_ref.shape[1], p_ref.shape[1]
    d2 = _dist2(c_ref[0], p_ref[0])
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)

    def body(j, carry):
        d2cur, idx_out = carry
        best = jnp.argmin(d2cur, axis=1).astype(jnp.int32)
        idx_out = jnp.where(kcol == j, best[:, None], idx_out)
        d2cur = jnp.where(lane == best[:, None], jnp.inf, d2cur)
        return d2cur, idx_out

    _, idx_out = lax.fori_loop(0, k, body,
                               (d2, jnp.zeros((mt, k), jnp.int32)))
    idx_ref[0] = idx_out


def _k_packed(c_ref, p_ref, idx_ref, *, k):
    mt, n = c_ref.shape[1], p_ref.shape[1]
    d2 = _dist2(c_ref[0], p_ref[0])
    # non-negative f32 bitcasts to order-monotone int32
    di = lax.bitcast_convert_type(d2, jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)
    big = jnp.int32(0x7F000000)

    def body(j, carry):
        dcur, idx_out = carry
        m = jnp.min(dcur, axis=1)                       # [Mt]
        # lowest-index lane attaining the min
        best = jnp.min(jnp.where(dcur == m[:, None], lane, n), axis=1)
        idx_out = jnp.where(kcol == j, best[:, None], idx_out)
        dcur = jnp.where(lane == best[:, None], big, dcur)
        return dcur, idx_out

    _, idx_out = lax.fori_loop(0, k, body,
                               (di, jnp.zeros((mt, k), jnp.int32)))
    idx_ref[0] = idx_out


def _k_thresh(c_ref, p_ref, idx_ref, *, k):
    mt, n = c_ref.shape[1], p_ref.shape[1]
    d2 = _dist2(c_ref[0], p_ref[0])
    di = lax.bitcast_convert_type(d2, jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)

    def body(j, carry):
        lastv, lasti, idx_out = carry
        cand = (di > lastv[:, None]) | (
            (di == lastv[:, None]) & (lane > lasti[:, None]))
        masked = jnp.where(cand, di, jnp.int32(0x7F000000))
        m = jnp.min(masked, axis=1)
        best = jnp.min(jnp.where(masked == m[:, None], lane, n), axis=1)
        idx_out = jnp.where(kcol == j, best[:, None], idx_out)
        return m, best, idx_out

    _, _, idx_out = lax.fori_loop(
        0, k, body,
        (jnp.full((mt,), jnp.int32(-1)), jnp.full((mt,), -1, jnp.int32),
         jnp.zeros((mt, k), jnp.int32)))
    idx_ref[0] = idx_out


def make_knn(kernel, k):
    @jax.jit
    def f(q, p):
        b, m, c = q.shape
        n = p.shape[1]
        return pl.pallas_call(
            functools.partial(kernel, k=k),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, m, c), lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, m, k), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, m, k), jnp.int32),
        )(q, p)

    return f


def main():
    rng = np.random.default_rng(0)
    B, N, k = 32, 1024, 20
    x = jnp.asarray(rng.standard_normal((B, N, 64)), jnp.float32)

    from pointcloudlib_tpu.ops.pallas.neighbors import knn_pallas

    # correctness first (against production)
    _, ref_idx = knn_pallas(x, x, k)
    for name, kern in [("base", _k_base), ("packed", _k_packed),
                       ("thresh", _k_thresh)]:
        f = make_knn(kern, k)
        got = f(x, x)
        ok = bool(jnp.all(got == ref_idx))
        print(f"{name:7s} correct={ok}")

    for name, kern in [("base", _k_base), ("packed", _k_packed),
                       ("thresh", _k_thresh)]:
        f = make_knn(kern, k)

        def chain(x, r, f=f):
            q = x
            for _ in range(r):
                idx = f(q, q)
                q = q + jnp.mean(idx.astype(jnp.float32)) * 1e-6
            return q

        t2 = bench(jax.jit(lambda x, c=chain: c(x, 2)), x)
        t8 = bench(jax.jit(lambda x, c=chain: c(x, 8)), x)
        print(f"{name:7s}: {(t8 - t2) / 6.0:.2f} ms/call")


if __name__ == "__main__":
    main()
