"""Fused neighbor-search Pallas kernels: ball query and kNN.

The XLA compositions (ops/geometry.py) materialize the [B, M, N]
distance matrix in HBM and run ``lax.top_k`` — a full sort per row that
dominates PointNet++/DGCNN step time (~10-20 ms each at B=64, N=1024).
These kernels fuse distance computation (MXU: ``|c|² - 2c·pᵀ + |p|²``)
with selection in VMEM and never write the distance matrix to HBM.

Selection strategies (no sorting networks needed):
* ball query — first-k-in-index-order semantics make selection a
  *rank* computation: ``rank = cumsum(in_radius)`` and the k-th
  neighbor is the lane where ``rank == k`` — one cumsum + one masked
  reduction, fully parallel (reproduces reference misc/ops.py:313-327
  exactly, including repeat-first padding).
* kNN — k rounds of masked argmin (k ≤ 64 in every model here), each a
  VPU reduction over lanes; ties break to the lower index like
  ``lax.top_k`` and the reference's insertion sort (misc/ops.py:504).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from pointcloudlib_tpu.ops.pallas.prec import pin_default_matmul_precision
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_FAR = 1e9  # padding coordinate, outside any radius


def _dist2(c: Array, p: Array, exact: bool = False) -> Array:
    """Squared distances [Mt, N] via the MXU expansion. ``exact``
    forces the f32 cross term (3-pass bf16): radius-membership tests
    compare against host builders bit-for-bit (kpconv/pyramid.py)."""
    c2 = jnp.sum(c * c, axis=1, keepdims=True)           # [Mt, 1]
    p2 = jnp.sum(p * p, axis=1, keepdims=True)           # [N, 1]
    inner = jax.lax.dot_general(
        c, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST if exact else None,
    )                                                     # [Mt, N]
    return jnp.maximum(c2 - 2.0 * inner + p2.T, 0.0)


def _cumsum_lanes(x: Array) -> Array:
    """Inclusive cumsum along the lane axis via log-step shift-adds
    (Mosaic has no native cumsum)."""
    mt, n = x.shape
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    return x


def _mxu_cumsum() -> bool:
    """Gate for the MXU cumsum in the default-path kernels. DEFAULT ON
    since round 3: validated on chip BIT-EXACT vs the rolls (the 0/1
    operands are bf16-exact and counts ≤ n ≪ 2²⁴ are integers in f32)
    and faster at every production shape — ball query 512×1024 k=64:
    1.55 → 1.24 ms; 512×4096: 8.71 → 7.24 ms (surface clouds,
    scripts/bench_bisect_knn.py). POINTCLOUDLIB_MXU_CUMSUM=0 forces
    the log-roll shift-adds."""
    import os

    return os.environ.get("POINTCLOUDLIB_MXU_CUMSUM") != "0"


def _cumsum_matmul(mask: Array, w: int = 512) -> Array:
    """Inclusive lane cumsum of a 0/1 mask via blocked upper-triangular
    bf16 matmuls. EXACT: the operands are 0/1 (bf16-exact) and the MXU
    accumulates in f32, where counts ≤ n ≪ 2²⁴ are integers. Replaces
    the log₂n `pltpu.roll` shift-add passes with a handful of MXU calls
    (~µs at [256, 2048]) — the rolls were the dominant VPU cost of
    rank-based selection at large n."""
    mt, n = mask.shape
    while n % w:
        w //= 2
    mb = mask.astype(jnp.bfloat16)
    tri = (lax.broadcasted_iota(jnp.int32, (w, w), 0)
           <= lax.broadcasted_iota(jnp.int32, (w, w), 1)
           ).astype(jnp.bfloat16)                  # L[m, j] = m ≤ j
    out = []
    prefix = jnp.zeros((mt, 1), jnp.float32)
    for g in range(n // w):
        blk = mb[:, g * w:(g + 1) * w]
        cs = lax.dot_general(blk, tri, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        out.append(cs + prefix)
        prefix = prefix + cs[:, w - 1:w]
    ranks = out[0] if len(out) == 1 else jnp.concatenate(out, axis=1)
    return ranks.astype(jnp.int32)


@pin_default_matmul_precision
def _ball_query_kernel(r2_ref, c_ref, p_ref, idx_ref, cnt_ref):
    mt = c_ref.shape[1]
    n = p_ref.shape[1]
    k = idx_ref.shape[2]
    d2 = _dist2(c_ref[0], p_ref[0])
    mask = d2 < r2_ref[0]
    maski = mask.astype(jnp.int32)
    # MXU cumsum (exact integer counts) — the log-roll shift-adds were
    # ~10 VPU passes of the kernel at n=1024; small n keeps the rolls
    rank = (_cumsum_matmul(maski) if n >= 256 and _mxu_cumsum()
            else _cumsum_lanes(maski))                    # [Mt, N]
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)
    # ramp is rank on in-radius lanes and 0 elsewhere (rank stays at
    # j+1 on out-of-radius lanes AFTER the (j+1)-th hit, so the mask
    # must fold in); ramp == j+1 then already implies in-radius —
    # one compare+select+reduce per extraction slot
    ramp = maski * rank

    cnt = rank[:, n - 1 :]                                # [Mt, 1]
    # adaptive slot bound: no row in this tile has more than max(cnt)
    # in-radius points, so later slots would extract nothing — they
    # keep their zero init and take the repeat-first fill below, which
    # is exactly what a full k-slot loop produces. Real counts are
    # usually far below k (the reference pads the same way,
    # misc/ops.py:321-326), so this cuts most extraction passes.
    nslots = jnp.minimum(jnp.max(cnt), k)
    # NOTE(round 3): a chunked-MXU extraction variant (ck slot one-hots
    # per trip, indices recovered by a [ck·Mt, N] @ [N, 8] byte-split
    # matmul) was built and A/B'd on chip 2026-08-19: bit-equal but
    # 0.57x at 512x1024 (1.16 -> 2.03 ms) and 0.70x at 512x4096
    # (7.21 -> 10.29 ms) — the [ck·Mt, N] one-hot build costs more VPU
    # than the ck select+reduce passes it replaces. Deleted, do not
    # retry (scripts/bench_bisect_knn.py docstring has the numbers).

    def body(j, idx_out):
        # at most one lane has ramp == j+1, so a sum-extract
        # recovers its index (0 when the slot is empty —
        # overwritten below)
        idx_j = jnp.sum(jnp.where(ramp == j + 1, lane, 0), axis=1)
        return jnp.where(kcol == j, idx_j[:, None], idx_out)

    idx = lax.fori_loop(0, nslots, body,
                        jnp.zeros((mt, k), jnp.int32))
    valid = kcol < cnt
    first = idx[:, 0:1]                                   # 0 when cnt==0
    idx_ref[0] = jnp.where(valid, idx, first)
    cnt_ref[0] = cnt  # [Mt, 1]


@pin_default_matmul_precision
def _knn_kernel(c_ref, p_ref, idx_ref, d2_ref, *, exact: bool = False):
    mt = c_ref.shape[1]
    n = p_ref.shape[1]
    k = idx_ref.shape[2]
    d2 = _dist2(c_ref[0], p_ref[0], exact=exact)
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)

    def body(j, carry):
        d2cur, idx_out, d2_out = carry
        best = jnp.argmin(d2cur, axis=1).astype(jnp.int32)    # [Mt]
        bestd = jnp.min(d2cur, axis=1)                        # [Mt]
        idx_out = jnp.where(kcol == j, best[:, None], idx_out)
        d2_out = jnp.where(kcol == j, bestd[:, None], d2_out)
        d2cur = jnp.where(lane == best[:, None], jnp.inf, d2cur)
        return d2cur, idx_out, d2_out

    init = (
        d2,
        jnp.zeros((mt, k), jnp.int32),
        jnp.zeros((mt, k), jnp.float32),
    )
    _, idx_out, d2_out = lax.fori_loop(0, k, body, init)
    idx_ref[0] = idx_out
    d2_ref[0] = d2_out


def _pad_points(p: Array, mult: int = 128) -> Array:
    n = p.shape[1]
    pad = (-n) % mult
    if pad:
        p = jnp.pad(p, ((0, 0), (0, pad), (0, 0)), constant_values=_FAR)
    return p


def _tile_m(m: int, n: int, k: int, bytes_per: int = 8) -> int:
    budget = 6 * 1024 * 1024
    cap = max(1, min(m, budget // max(1, n * k * bytes_per), 256))
    # mt is the sublane dim of the output blocks: multiple of 8 or m
    for mt in range(cap - cap % 8, 0, -8):
        if m % mt == 0:
            return mt
    return m


def _gate_key(*names) -> tuple:
    """Current values of env-var route gates, for use as a STATIC jit
    argument: gates are read at trace time, so a module-level jit
    would otherwise silently serve the stale route from its cache
    after an env flip (A/B scripts flip them in-process)."""
    import os

    return tuple(os.environ.get(n) for n in names)


def ball_query_pallas(centers, points, radius, k, interpret=False):
    """Drop-in for ops.geometry.ball_query on TPU (same semantics)."""
    return _ball_query_pallas_jit(
        centers, points, radius=radius, k=k, interpret=interpret,
        _gates=_gate_key("POINTCLOUDLIB_MXU_CUMSUM"))


@functools.partial(
    jax.jit, static_argnames=("radius", "k", "interpret", "_gates")
)
def _ball_query_pallas_jit(
    centers: Array,
    points: Array,
    radius: float,
    k: int,
    interpret: bool = False,
    _gates: tuple = (),
) -> Tuple[Array, Array]:
    b, m, c = centers.shape
    n = points.shape[1]
    p = _pad_points(points.astype(jnp.float32))
    npad = p.shape[1]
    # live VMEM is a handful of [Mt, N] planes (no 3-D tensor): big tiles
    mt = _tile_m(m, npad, 1, bytes_per=32)
    r2 = jnp.full((1,), radius * radius, jnp.float32)

    idx, cnt = pl.pallas_call(
        _ball_query_kernel,
        grid=(b, m // mt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mt, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.int32),
        ),
        interpret=interpret,
    )(r2, centers.astype(jnp.float32), p)
    return idx, cnt[..., 0]


@functools.partial(jax.jit,
                   static_argnames=("k", "interpret", "exact"))
def knn_pallas(
    query: Array,
    points: Array,
    k: int,
    interpret: bool = False,
    exact: bool = False,
) -> Tuple[Array, Array]:
    """Drop-in for ops.geometry.knn on TPU: returns (sq_dists, idx),
    ascending, ties to the lower index. Padded rows sit at distance
    ~1e18 so they are never selected while real points remain.
    ``exact`` forces f32 cross terms (KPConv radius membership)."""
    b, m, c = query.shape
    n = points.shape[1]
    assert k <= n, (k, n)
    p = _pad_points(points.astype(jnp.float32))
    npad = p.shape[1]
    mt = _tile_m(m, npad, 1, bytes_per=16)

    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, exact=exact),
        grid=(b, m // mt),
        in_specs=[
            pl.BlockSpec((1, mt, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, m, k), jnp.float32),
        ),
        interpret=interpret,
    )(query.astype(jnp.float32), p)
    return d2, idx


@pin_default_matmul_precision
def _knn_gather_kernel(c_ref, p_ref, v_ref, idx_ref, g_ref, *, k: int,
                       stride: int = 1):
    """Fused kNN + gather: each argmin round's selection mask
    (``lane == best``) doubles as the one-hot gather row, so the
    separate gather's rows·k·N one-hot build and the idx round-trip
    disappear (same trick as fused_edge._ke_knn_f1). Gathered values
    ride a [k, mt, cv] layout (round index on an untiled dim).

    ``stride`` implements PointCNN's dilated kNN (reference
    misc/layers.py:354-358: kNN of k·D then every D-th rank): slot s
    gathers rank s·stride; the skipped ranks advance with argmin+mask
    rounds only — no gather matmuls."""
    n = p_ref.shape[1]
    mt = c_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)
    d2 = _dist2(c_ref[0], p_ref[0])
    # hi/lo bf16 split keeps the gathered f32 values ~1-ulp exact
    # (ops/pallas/gather.py's trick — a bf16 one-hot x f32 matmul would
    # truncate the values to 8 mantissa bits)
    v = v_ref[0]
    v_hi = v.astype(jnp.bfloat16)
    v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def slot(j, d2cur, idx_out):
        best = jnp.argmin(d2cur, axis=1).astype(jnp.int32)
        ind = lane == best[:, None]
        onehot = ind.astype(jnp.bfloat16)
        g = (jnp.dot(onehot, v_hi, preferred_element_type=jnp.float32)
             + jnp.dot(onehot, v_lo,
                       preferred_element_type=jnp.float32))
        g_ref[0, pl.ds(j, 1), :, :] = g[None]
        idx_out = jnp.where(kcol == j, best[:, None], idx_out)
        d2cur = jnp.where(ind, jnp.inf, d2cur)
        return d2cur, idx_out

    def body(j, carry):
        d2cur, idx_out = slot(j, *carry)
        # dilated: burn the next stride-1 ranks without gathering
        # (static unroll — stride is 1 for every non-PointCNN caller)
        for _ in range(stride - 1):
            skip = jnp.argmin(d2cur, axis=1).astype(jnp.int32)
            d2cur = jnp.where(lane == skip[:, None], jnp.inf, d2cur)
        return d2cur, idx_out

    zero_idx = jnp.zeros((mt, k), jnp.int32)
    if stride == 1:
        _, idx_out = lax.fori_loop(0, k, body, (d2, zero_idx))
    else:
        # the last slot's burned ranks are never read — run k−1 full
        # trips, then a gather-only tail (saves (stride−1) full-width
        # argmin+mask passes per tile)
        carry = lax.fori_loop(0, k - 1, body, (d2, zero_idx))
        _, idx_out = slot(k - 1, *carry)
    idx_ref[0] = idx_out


def _knn_gather_fwd_call(query, points, values, k, interpret,
                         stride=1, ordered=False):
    b, m, cf = query.shape
    n, cv = values.shape[1], values.shape[2]
    assert k * stride <= n, (k, stride, n)
    # Mosaic pads block lanes to 128-wide tiles: budget the PADDED
    # double-buffered g block (k × mt × pad(cv)) — the dominant resident
    per_row = 2 * (k * max(cv, 128) * 4 + k * 4 + 128 * 4) + n * 8
    budget = (5 << 20) - 4 * n * (cf + cv)
    cap = max(1, min(m, budget // per_row))
    for mt in range(cap - cap % 8, 0, -8):
        if m % mt == 0:
            break
    else:
        mt = m
    nt = m // mt
    idx, g = pl.pallas_call(
        functools.partial(_knn_gather_kernel, k=k, stride=stride),
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec((1, mt, cf), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, n, cf), lambda i: (i // nt, 0, 0)),
            pl.BlockSpec((1, n, cv), lambda i: (i // nt, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, mt, k), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, k, mt, cv),
                         lambda i: (i // nt, 0, i % nt, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, k, m, cv), jnp.float32),
        ],
        interpret=interpret,
    )(query.astype(jnp.float32), points.astype(jnp.float32),
      values.astype(jnp.float32))
    return idx, jnp.swapaxes(g, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def knn_gather(query, points, values, k, interpret=False, stride=1,
               ordered=False):
    """``(idx [B,M,k], grouped [B,M,k,Cv])`` — kNN of ``query`` in
    ``points`` space with ``values`` rows gathered in the same kernel.
    Neighbor selection carries no gradient (discrete, like the
    reference); d_values is the scatter-as-matmul of
    ops/pallas/gather.py. Note: the gather one-hot here is f32·f32
    (exact row pick), so grouped values are EXACT copies — no bf16
    rounding.

    ``stride=D`` returns ranks 0, D, 2D, … (PointCNN dilated kNN,
    misc/layers.py:354-358); ``ordered=True`` asserts the positional
    consumer's requirement (XConv) that slots are in ascending-distance
    order — the argmin-rounds selection always is, so the flag is a
    documented contract, not a route (a bisect selection route that
    numbered slots in index order was removed in round 3 after losing
    its on-chip A/B)."""
    idx, grouped = _knn_gather_fwd_call(
        lax.stop_gradient(query), lax.stop_gradient(points),
        values, k, interpret, stride, ordered)
    return idx, grouped


def _knn_gather_fwd(query, points, values, k, interpret, stride,
                    ordered):
    idx, grouped = knn_gather(query, points, values, k, interpret,
                              stride, ordered)
    return (idx, grouped), (idx, values.shape[1])


def _knn_gather_bwd(k, interpret, stride, ordered, res, cts):
    _didx, dg = cts
    idx, n = res
    # routed: Pallas scatter-as-matmul when its footprint fits scoped
    # VMEM, XLA scatter-add otherwise (round 3 called the kernel
    # unconditionally and PointCNN partseg OOM'd at f32[16,2048,8,131])
    from pointcloudlib_tpu.ops.pallas.gather import scatter_rows

    return None, None, scatter_rows(dg, idx, n, interpret)


knn_gather.defvjp(_knn_gather_fwd, _knn_gather_bwd)


@pin_default_matmul_precision
def _k_three_interp(c_ref, p_ref, f_ref, out_ref, idx_ref, w_ref):
    """Dedicated 3-NN inverse-distance interpolation (the FP-decoder
    hot op, reference misc/ops.py:54-107): three STATIC argmin rounds
    over the [mt, N] distance tile — no sort, no generic k-loop, no
    dynamic stores — the three selection masks stack into ONE
    [3·mt, N] one-hot that gathers coords and features in a single
    matmul pair (hi/lo bf16 split ⇒ exact row picks), and the
    inverse-distance weighted sum runs in f32 on the [3·mt, C] result,
    emitting [mt, C] directly: no [M, 3, C] HBM intermediate, no
    slot-outer layout transpose (both costs made the generic
    ``knn_gather`` route lose its round-3 step-level A/B).

    Weight math matches ``three_nn`` exactly: d² recomputed as
    Σ(q−g)² in f32 from the gathered coords (self-pairs ⇒ hard copy;
    the bf16-expansion d² noise poisons 1/(d²+1e-8), docs/DESIGN.md
    "convergence defect"), weights 1/(d²+1e-8) normalized over the 3
    slots."""
    n = p_ref.shape[1]
    mt = c_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    c = c_ref[0]
    p = p_ref[0]
    d2 = _dist2(c, p)

    inds = []
    bests = []
    for _ in range(3):
        best = jnp.argmin(d2, axis=1).astype(jnp.int32)
        ind = lane == best[:, None]
        inds.append(ind)
        bests.append(best)
        d2 = jnp.where(ind, jnp.inf, d2)

    # coords ride a THREE-term bf16 split (3×8 = 24 mantissa bits —
    # exact f32 row picks): the weights 1/(d²+1e-8) amplify coord
    # noise at small distances, and the extra term is a [N, 3→128]
    # matmul — trivial. Features below keep the 2-term split (~2^-16
    # relative — activation-level noise, absorbed by every consumer).
    oh = jnp.concatenate([i.astype(jnp.bfloat16) for i in inds], 0)
    p_hi = p.astype(jnp.bfloat16)
    p_mid_f = p - p_hi.astype(jnp.float32)
    p_mid = p_mid_f.astype(jnp.bfloat16)
    p_lo = (p_mid_f - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    g = (jnp.dot(oh, p_hi, preferred_element_type=jnp.float32)
         + jnp.dot(oh, p_mid, preferred_element_type=jnp.float32)
         + jnp.dot(oh, p_lo, preferred_element_type=jnp.float32))

    invs = []
    for j in range(3):
        d2e = jnp.sum((c - g[j * mt:(j + 1) * mt]) ** 2, axis=1)
        invs.append(1.0 / (d2e + 1e-8))
    denom = invs[0] + invs[1] + invs[2]

    f = f_ref[0]
    f_hi = f.astype(jnp.bfloat16)
    f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    gf = (jnp.dot(oh, f_hi, preferred_element_type=jnp.float32)
          + jnp.dot(oh, f_lo, preferred_element_type=jnp.float32))

    wcols = []
    out = jnp.zeros((mt, f.shape[1]), jnp.float32)
    for j in range(3):
        w = invs[j] / denom
        wcols.append(w[:, None])
        out = out + w[:, None] * gf[j * mt:(j + 1) * mt]
    out_ref[0] = out
    idx_ref[0] = jnp.concatenate([b[:, None] for b in bests], axis=1)
    w_ref[0] = jnp.concatenate(wcols, axis=1)


def _three_interp_fwd_call(query, points, feats, interpret):
    b, m, _ = query.shape
    cv = feats.shape[2]
    p = _pad_points(points.astype(jnp.float32))
    n = p.shape[1]
    if n != feats.shape[1]:
        feats = jnp.pad(
            feats, ((0, 0), (0, n - feats.shape[1]), (0, 0)))
    cpad = max(cv, 128)
    # residents: double-buffered out [mt, pad(cv)] + idx/w [mt, 3→128]
    # + the [3mt, n] bf16 one-hot + [3mt, pad(cv)] f32 gathered feats
    # + ~4 [mt, n]-scale f32 temporaries (d2 + masked copies)
    per_row = 2 * (cpad * 4 + 2 * 128 * 4) + 12 * cpad + n * 22
    budget = (5 << 20) - 4 * n * (3 + cv)
    cap = max(1, min(m, budget // per_row))
    for mt in range(cap - cap % 8, 0, -8):
        if m % mt == 0:
            break
    else:
        mt = m
    nt = m // mt
    out, idx, w = pl.pallas_call(
        _k_three_interp,
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec((1, mt, 3), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, n, 3), lambda i: (i // nt, 0, 0)),
            pl.BlockSpec((1, n, cv), lambda i: (i // nt, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, mt, cv), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, mt, 3), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, mt, 3), lambda i: (i // nt, i % nt, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, cv), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 3), jnp.int32),
            jax.ShapeDtypeStruct((b, m, 3), jnp.float32),
        ],
        interpret=interpret,
    )(query.astype(jnp.float32), p, feats.astype(jnp.float32))
    return out, idx, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def three_interp(query, points, feats, interpret=False):
    """Fused 3-NN inverse-distance-weighted interpolation:
    ``query [B,M,3], points [B,N,3], feats [B,N,C] → [B,M,C]``.
    Matches ``ops.geometry.three_nn_interpolate``'s XLA route (exact
    recomputed d², 1e-8 epsilon — reference misc/ops.py:86-93) without
    the [B,M,N] HBM distance matrix + full-sort ``top_k`` or the
    [B,M,3,C] gathered intermediate. Selection carries no gradient
    (discrete); d_feats is the routed scatter-as-matmul with the
    slot weights folded in."""
    out, _, _ = _three_interp_fwd_call(
        lax.stop_gradient(query), lax.stop_gradient(points),
        feats, interpret)
    return out


def _three_interp_fwd(query, points, feats, interpret):
    out, idx, w = _three_interp_fwd_call(
        lax.stop_gradient(query), lax.stop_gradient(points),
        feats, interpret)
    return out, (idx, w, feats.shape[1])


def _three_interp_bwd(interpret, res, dout):
    idx, w, n = res
    from pointcloudlib_tpu.ops.pallas.gather import scatter_rows

    # padded support rows sit at _FAR and are never selected while
    # ≥3 real points exist, so idx < n and the scatter target needs
    # no padding
    dg = w[..., None] * dout[:, :, None, :]       # [B, M, 3, C]
    return None, None, scatter_rows(dg, idx, n, interpret)


three_interp.defvjp(_three_interp_fwd, _three_interp_bwd)
