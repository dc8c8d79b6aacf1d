"""Fully-fused PointNet++ set-abstraction MLP (Pallas TPU).

The SA layer's hot chain is ``gather → Dense → BN → ReLU ×3 → max`` over
``rows = B·M·K`` grouped points (reference networks/cls/pointnet2.py:45-57,
misc/ops.py:289-407 grouping). The unfused XLA path materializes every
``[rows, C]`` activation in f32 HBM, forward and backward — measured
~30 ms of the ~51 ms SA1 fwd+bwd at B=64/N=1024
(scripts/profile_sa.py). Design here:

* the **gather rides the first matmul**: with ``Q = [xyz‖feats]·W1``
  precomputed in XLA (cheap, [N,C0]×[C0,C1]), the grouped first-layer
  pre-activation is ``h1 = Q[idx] − newxyz·W1[:3]`` — the gather is the
  one-hot MXU matmul of ops/pallas/gather.py but *width C1*, which
  costs the same as width 3 (MXU lanes are 128 wide either way);
* **only h1 is checkpointed** (bf16, 268 MB ≈ 0.35 ms at SA1). The
  rest of the chain is so MXU-cheap (tens of GFLOP) that every later
  pass recomputes it in VMEM from h1 instead of touching HBM — the
  first version checkpointed h2/h3/dz too and was DMA-bound;
* train-mode BatchNorm couples all tiles through its batch statistics,
  so the forward is ``F1`` (gather + Σ/Σ² of h1) then one
  stats-recompute pass per remaining BN, then the output pass;
* the backward is the mirrored chain: one reduction pass per BN level
  (the dstat sums ARE dβ/dγ), ``dW`` as in-kernel row-contraction
  matmuls, and the input gradient as the transposed one-hot matmul
  (scatter-as-matmul, hi/lo split for f32 accuracy);
* kernels take whole per-batch(-tile) blocks and loop over row chunks
  internally — few large DMAs instead of thousands of small grid
  blocks;
* eval mode needs no statistics: one kernel runs the whole chain;
* **windowed gathers** (round 3): the one-hot build and its matmuls
  cost rows·N — but when the cloud is spatially sorted
  (ops/spatial.py Hilbert canonicalization, applied by the trainer),
  a tile of neighboring centers draws its indices from a narrow
  window of the source. Rows are permuted per batch element so tiles
  are index-clustered (σ = argsort of each row's min neighbor index —
  semantics-invisible: outputs are permuted back), each tile gets a
  window start from its actual min index (SMEM descriptor), and
  tiles whose span exceeds the static width W = N/4 take a full-N
  fallback branch — so the windowed path is exact for ANY input
  ordering, sorted or not.

Numerics: matmul inputs are bf16 (exactly the ``nn.Dense(dtype=bf16)``
policy of the unfused path), accumulation and BN math f32; the h1
checkpoint is bf16 (the only extra rounding vs the XLA path — ~1e-2
relative, see tests/test_fused_sa.py and the executable spec
``fused_sa_reference``). Max-pool backward splits the gradient evenly
among ties, matching ``jnp.max``; ReLU gradient at 0 is 0, matching
``jax.nn.relu``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from pointcloudlib_tpu.ops.pallas.prec import pin_default_matmul_precision
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EPS = 1e-5  # BatchNorm epsilon (nn/layers.py DenseBNAct)


class SAParams(NamedTuple):
    """Learned parameters of the fused 3-layer SA MLP (no Dense biases —
    bias iff no BN, like DenseBNAct; W1 lives outside, folded into Q)."""

    w2: Array            # [C1, C2]
    w3: Array            # [C2, C3]
    g1: Array            # BN scale / offset per layer
    b1: Array
    g2: Array
    b2: Array
    g3: Array
    b3: Array


class SAStats(NamedTuple):
    """Per-layer batch statistics (biased variance, flax convention)."""

    m1: Array
    v1: Array
    m2: Array
    v2: Array
    m3: Array
    v3: Array


def _rsig(v):
    return lax.rsqrt(v + _EPS)


# ---------------------------------------------------------------- tiling


def _divisor_tile(m: int, cap: int) -> int:
    """Largest divisor of m ≤ cap (plain — used for IN-KERNEL chunk
    sizes, which are dynamic-slice extents with no tiling constraint)."""
    mt = max(1, min(m, cap))
    while m % mt:
        mt -= 1
    return mt


def _block_tile(m: int, cap: int) -> int:
    """Largest divisor of m that is ≤ cap and a multiple of 8 — for
    BLOCK row tiles, where mt can land in a block's last-two dims
    (Mosaic: multiple of 8 or equal to the array dim). Falls back to m
    (block == array dim is always legal)."""
    cap = max(1, min(m, cap))
    for mt in range(cap - cap % 8, 0, -8):
        if m % mt == 0:
            return mt
    return m


def _m_tile(m: int, k: int, bf16_widths: int, f32_widths: int = 0,
            fixed_bytes: int = 0) -> int:
    """Rows tile from a VMEM budget: double-buffered block bytes per
    m-row = k·(2·bf16_widths + 4·f32_widths)·2 against a ~6 MB budget
    (leaving room for the chunk temporaries), minus ``fixed_bytes`` for
    mt-independent residents (e.g. the scatter accumulator block+carry,
    which scale with N not mt)."""
    per_row = 2 * k * (2 * bf16_widths + 4 * f32_widths)
    budget = max(1 << 19, (6 << 20) - fixed_bytes)
    return _block_tile(m, budget // max(1, per_row))


def _chunk(mt: int, k: int, cmax: int = 128) -> int:
    """m-rows per in-kernel chunk — bigger vector ops beat smaller
    temporaries while VMEM still fits.

    Flat-row target min(4096, 512k/cmax) where cmax is the widest f32
    chunk temporary the pass materializes. Chip anchors (r4): 4096
    flat rows at c=128 is the measured optimum (headline 2142 -> 2252
    sa/s, partseg 1055 -> 1064 via POINTCLOUDLIB_CHUNK_ROWS); 4096 at
    c=256 (MSG2's k=128 scale) and 8192 at c=128 are compile-time
    VMEM OOMs — the kernel sweep enforces the envelope. Trace-time
    env override for A/Bs (fresh process per arm)."""
    import os

    env = os.environ.get("POINTCLOUDLIB_CHUNK_ROWS")
    rows = int(env) if env else min(4096, (1 << 19) // max(1, cmax))
    return _divisor_tile(mt, max(1, rows // k))


def _split_cnt(c1: int) -> bool:
    """Split-scatter gate: when 2·c1 is MXU-lane-tile aligned, drop the
    8 count columns from the scatter right operand (one fewer 128-lane
    output tile) and derive the counts from a slot-summed one-hot matmul
    — bit-exact (integer products; see _k_p2). POINTCLOUDLIB_SPLIT_CNT=0
    forces the single-matmul layout for subprocess A/Bs."""
    import os

    return (2 * c1) % 128 == 0 and os.environ.get(
        "POINTCLOUDLIB_SPLIT_CNT") != "0"


def _gchunk(mt: int, k: int, n: int) -> int:
    """Chunk for gather/scatter kernels: the one-hot block
    [cm·K, N] bf16 plus its int32 iota (6 B/element) stay ~6 MB.

    6 MB (up from round 2's 3 MB) is the round-4 chip-measured
    optimum: p2 14.3 → 12.2 ms and f1 6.3 → 5.5 ms at the headline
    SA1 shape, similar at MSG's k=128 (scripts/bench_p2_knobs.py) —
    at 3 MB the k=128 shapes fell to cm=4 rows/chunk and the per-chunk
    Mosaic loop overhead dominated. 10 MB never finished compiling
    (900 s timeout). POINTCLOUDLIB_GCHUNK_MB overrides for A/Bs
    (trace-time read — fresh process per arm, CLAUDE.md)."""
    import os

    mb = int(os.environ.get("POINTCLOUDLIB_GCHUNK_MB", "6"))
    return _divisor_tile(mt, max(1, (mb << 20) // (6 * k * n)))


def _gchunk_w(mt: int, k: int, w: int, cmax: int) -> int:
    """Chunk for the WINDOWED gather/scatter kernels. The one-hot block
    is [cm·K, w], so budgeting on w instead of n gives 4x bigger chunks
    at w = n/4 — fewer per-chunk cond/loop trips, the dominant overhead
    at small cm (measured N=4096 fwd+bwd 27.3 → 21.4 ms). But the ~10
    f32 chunk temporaries [cm·K, c] are then no longer bounded by
    n ≥ 4w: charge them explicitly (~2.5 MB across 10 copies) or
    wide-channel shapes blow scoped VMEM (the forced-window SA2 sweep
    shape OOMed at 16.43 MB with the onehot-only budget).
    POINTCLOUDLIB_GCHUNK_W_MB overrides the one-hot budget for on-chip
    A/Bs at N=4096 (the unwindowed 3→6 MB bump won −14% on p2)."""
    import os

    mb = int(os.environ.get("POINTCLOUDLIB_GCHUNK_W_MB", "3"))
    by_onehot = (mb << 20) // (6 * k * w)
    by_temps = (5 << 19) // (40 * k * cmax)
    # floor at 8: Mosaic rejects sub-sublane-tile dynamic stores of the
    # per-chunk output rows at wide c (vector<1x4x256> store, sweep);
    # the temps estimate is conservative enough to absorb 8 rows
    return _divisor_tile(mt, max(8, min(by_onehot, by_temps)))


# ------------------------------------------------------------- windowing


def _window_width(n: int) -> int | None:
    """Static gather-window width for a source of n points: N/4 rounded
    up to a lane tile, or None when windowing cannot pay (small n) or
    is disabled (POINTCLOUDLIB_SA_WINDOW=0)."""
    import os

    forced = os.environ.get("POINTCLOUDLIB_SA_WINDOW")
    if forced == "0":
        return None
    if n % 128 or n < 256:
        return None
    # measured on v5e (docs/DESIGN.md): the per-chunk branch overhead
    # cancels the saved lanes below n=4096 (-2% at 2048, -7% at 1024);
    # +13% end-to-end at n=4096
    if n < 4096 and forced != "1":
        return None
    for w in (-(-max(n // 4, 128) // 128) * 128, n // 2):
        if w < n and n % w == 0:
            return w
    return None


def _row_perm(idx: Array):
    """Per-batch permutation σ clustering rows by neighbor locality
    (sort by each row's min neighbor index), plus its inverse."""
    key = jnp.min(idx, axis=2)
    sigma = jnp.argsort(key, axis=1).astype(jnp.int32)
    inv = jnp.argsort(sigma, axis=1).astype(jnp.int32)
    return sigma, inv


def _take_rows(x: Array, perm: Array) -> Array:
    """Permute rows of [B, M, ...] by [B, M] — routed through the
    Pallas gather on TPU (XLA's narrow-row gather is ~100x off
    roofline; ops/pallas/gather.py)."""
    from pointcloudlib_tpu.ops.geometry import index_points

    if jnp.issubdtype(x.dtype, jnp.integer):
        # index payloads are small non-negative ints — exact in f32
        return index_points(x.astype(jnp.float32), perm).astype(x.dtype)
    return index_points(x, perm)


def _window_plan(idx: Array, cm: int, w: int, n: int):
    """Per-chunk window starts and block counts, flattened to
    ``b * (m // cm) + chunk`` (b-major, matching the kernels' flat
    tile/chunk order). A chunk whose index span fits ``[s, s+w)`` runs
    ONE gather block at ``s``; otherwise it runs all ``n // w`` blocks
    (the unified block loop — non-matching blocks contribute exact
    zeros, so both cases compute the same sums)."""
    b, m, k = idx.shape
    t = idx.reshape(b, m // cm, cm * k)
    lo = jnp.min(t, axis=2)
    hi = jnp.max(t, axis=2)
    s = jnp.minimum(lo - (lo % 8), n - w)
    narrow = hi - s < w
    starts = jnp.where(narrow, s, 0)
    nblocks = jnp.where(narrow, 1, n // w).astype(jnp.int32)
    return starts.reshape(-1), nblocks.reshape(-1)


# --------------------------------------------------------- kernel helpers


def _bn_relu2(h2d, st_ref, with_z=False):
    """relu(BN(h)) from a folded [1, 4, C] stats block whose rows are
    (sc, bi, rs, mrs): sc = γ/σ, bi = β − μ·sc, rs = 1/σ, mrs = μ/σ —
    folding the 5-op BN into a 2-op affine (the passes are VPU-bound)."""
    sc = st_ref[0, 0:1, :]
    bi = st_ref[0, 1:2, :]
    z = h2d * sc + bi
    y = jnp.maximum(z, 0.0)
    return (y, z) if with_z else y


def _xhat(h2d, st_ref):
    return h2d * st_ref[0, 2:3, :] - st_ref[0, 3:4, :]


def _fwd_to(h1c, st1_ref, st2_ref=None, w2_ref=None):
    """Recompute the chain from an h1 chunk: returns (y1[, h2, y2])."""
    y1 = _bn_relu2(h1c, st1_ref)
    if w2_ref is None:
        return (y1,)
    h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                 preferred_element_type=jnp.float32)
    y2 = _bn_relu2(h2, st2_ref)
    return y1, h2, y2


def _bn_bwd_row(dz2d, xhat2d, st_ref, s_ref, r: float):
    """Per-row dh of train-mode BN given the global sums s = [Σdz,
    Σdz·x̂]: dh = (γ/σ)(dz − Σdz/R − x̂·Σdzx̂/R), with γ/σ read from the
    folded stats (sc row)."""
    sc = st_ref[0, 0:1, :]
    u1 = s_ref[0, 0:1, :] * (1.0 / r)
    u2 = s_ref[0, 1:2, :] * (1.0 / r)
    return sc * (dz2d - u1 - xhat2d * u2)


def _maxpool_dz(h3_2d, dout2d, st_ref, cm: int, k: int, e: int = 0,
                sm: bool = False):
    """Per-row gradient at z3 = BN(h3): max-pool (even tie split,
    matching jnp.max) then relu mask. h3_2d is a [cm·k, C] chunk,
    dout2d the matching [cm, C] rows. With the slot dim capped (e > 0)
    the e unread replicas of slot 0 join the tie count whenever slot 0
    ties the max — their (identical) shares are added back analytically
    by the callers' slot-0 weighting. ``sm``: the chunk is SLOT-major
    ([k·cm] rows, slot outer) — groups run down axis 0."""
    c = h3_2d.shape[-1]
    y, z = _bn_relu2(h3_2d, st_ref, with_z=True)
    if sm:
        a = y.reshape(k, cm, c)
        amax = jnp.max(a, axis=0, keepdims=True)
        ties = (a == amax).astype(jnp.float32)
        tsum = jnp.sum(ties, axis=0, keepdims=True)
        if e:
            tsum = tsum + float(e) * ties[0:1]
        da = dout2d[None, :, :] * ties / tsum
        return jnp.where(z > 0, da.reshape(k * cm, c), 0.0)
    a = y.reshape(cm, k, c)
    amax = jnp.max(a, axis=1, keepdims=True)
    ties = (a == amax).astype(jnp.float32)
    tsum = jnp.sum(ties, axis=1, keepdims=True)
    if e:
        tsum = tsum + float(e) * ties[:, 0:1, :]
    da = dout2d[:, None, :] * ties / tsum
    return jnp.where(z > 0, da.reshape(cm * k, c), 0.0)


def _psum_init(psum_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        psum_ref[0] = jnp.zeros_like(psum_ref[0])


def _acc2(acc, x2d):
    return (acc[0] + jnp.sum(x2d, axis=0, keepdims=True),
            acc[1] + jnp.sum(x2d * x2d, axis=0, keepdims=True))


def _zeros2(c):
    return (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32))


# ------------------------------------------------- slot capping (round 2)
#
# Ball-query slabs are mostly repeat-padding: every slot j >= cnt(row)
# replicates the row's slot 0 (misc/ops.py:321-326), and measured
# occupancies are far below k (headline SA1 r=.2/k=64: mean cnt ~10;
# MSG r=.4/k=128: mean ~41, max 66 — scripts/profile_sa_k128.py). All
# replica rows have IDENTICAL forward values and, because the max-pool
# tie split and every later op is row-local given the global BN sums,
# identical backward values too. So whenever max(cnt) <= kc the passes
# after the gather may process only the first kc slots and account for
# the k-kc unread replicas in closed form: weight each row's slot 0 by
# (1+e), e = k-kc, in every row-sum, and add e*(slot0 ties) to the
# max-pool tie denominator. e = 0 recovers the full computation — one
# parameterized kernel set serves both, selected by lax.cond on
# max(cnt) (pmax'd over the DP axis so shards agree on the branch).


def _kc_variants(k: int):
    """Static slot caps to compile: ascending, k last (the fallback).

    Quarter-multiples of k (8-row aligned for the sublane tile; kc
    need not divide k — the h1 BlockSpec always reads slot block 0).
    Measured occupancies sit well below k with a thin tail (MSG
    r=.4/k=128: mean 41, max ~66 → the 3k/4 rung), so three rungs
    cover the distribution without blowing up compile time (each rung
    compiles 5 kernels)."""
    import os

    if os.environ.get("POINTCLOUDLIB_SA_RUNGS") != "1":
        # DEFAULT OFF (round 3): on realistic object-SURFACE clouds the
        # occupancy tail almost always lands above the top rung — every
        # batch then pays the cond chain AND runs the full branch.
        # Measured on-chip (scripts/bench_partseg_ab.py, surface
        # clouds): headline 1765 -> 1904 sa/s and partseg 818 -> 876
        # with the chain off. The +23% recorded in round 2b was an
        # artifact of sphere-SHELL profiling clouds (max(cnt) <= 24 at
        # SA1 k=32 vs 27-400 on surfaces) — see DESIGN.md "profile
        # data density sets the rung". POINTCLOUDLIB_SA_RUNGS=1
        # re-enables for shell-like (LiDAR ring / hollow-scan) data.
        return [k]
    out = []
    for kc in (k // 4, k // 2, 3 * k // 4):
        if kc >= 8 and kc % 8 == 0 and kc < k and kc not in out:
            out.append(kc)
    return out + [k]


def _cap_gather() -> bool:
    """Gate for slot-capping the GATHER pass itself (_call_f1 moves
    inside the max(cnt) cond chain; _kc_variants note above). The
    gather's one-hot build + matmul scale with the slot count, so this
    is the largest remaining capped-away cost (the bq route caps its
    gather in-kernel already — this covers the external-idx route, e.g.
    MSG's k=128 scale). Subordinate to POINTCLOUDLIB_SA_RUNGS: with the
    rung chain off (the round-3 default — a net loss on object-surface
    density, see _kc_variants) _kc_variants returns [k] and this gate
    has no effect. POINTCLOUDLIB_CAP_GATHER=1 enables it alongside
    SA_RUNGS=1 for shell-like data; compiled+executed on-chip by the
    SA_RUNGS validation runs and on the CPU mesh by dryrun_multichip."""
    import os

    return os.environ.get("POINTCLOUDLIB_CAP_GATHER") == "1"


def _slot_w(cm: int, kc: int, e: int, sm: bool = False):
    """[cm*kc, 1] per-row weight: 1+e on each row's slot 0, else 1.
    ``sm`` (slot-major rows): slot 0 is the FIRST cm rows."""
    i = lax.broadcasted_iota(jnp.int32, (cm * kc, 1), 0)
    if sm:
        return jnp.where(i < cm, float(1 + e), 1.0)
    return jnp.where(i % kc == 0, float(1 + e), 1.0)


def _slot0(x2d, cm: int, kc: int, sm: bool = False):
    """The slot-0 rows (i % kc == 0) of a [cm*kc, c] chunk, [cm, c].
    Slot-major chunks (``sm``): simply the first cm rows.

    bf16 contractions account for the e capped-away replicas as
    ``dot(x, y) + e * dot(slot0(x), slot0(y))`` — slicing the SAME
    bf16 operands keeps every product bit-identical to the full-k
    path (weighting an operand by 1+e before the bf16 cast would
    round differently: bf16((1+e)x) != (1+e)bf16(x))."""
    if sm:
        return x2d[:cm, :]
    return x2d.reshape(cm, kc, x2d.shape[-1])[:, 0, :]


def _cond_chain(maxcnt, variants, fn):
    """fn(kc) for the smallest compiled kc with maxcnt <= kc; fn(k)
    when none fits (variants[-1] == k, always valid)."""
    def chain(i):
        if i == len(variants) - 1:
            return functools.partial(fn, variants[i])
        return lambda: lax.cond(
            maxcnt <= variants[i],
            functools.partial(fn, variants[i]),
            chain(i + 1),
        )
    return chain(0)()


# ------------------------------------------------------------ fwd kernels


@pin_default_matmul_precision
def _k_f1(q_ref, idx_ref, off_ref, h1_ref, psum_ref, *, cm: int,
          e: int = 0):
    """Gather pass: h1 = Q[idx] − off (bf16 checkpoint), Σ/Σ² of h1.

    Slot-capped (e > 0, under the max(cnt) <= kc branch — _cap_gather):
    only the first kc = k − e slots run the one-hot build + gather
    matmul. Slots >= kc are repeat-padding replicas of slot 0
    (reference misc/ops.py:321-326), so their h1 rows are written as
    copies of slot 0's bf16 row — bit-identical to gathering them —
    and slot 0 carries weight 1+e in the f32 sums (_slot_w)."""
    n, c = q_ref.shape[1], q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    kc = k - e
    _psum_init(psum_ref)

    lane = lax.broadcasted_iota(jnp.int32, (cm, kc, n), 2)
    w = _slot_w(cm, kc, e) if e else None

    def body(i, acc):
        idx = idx_ref[0, pl.ds(i * cm, cm), :][:, 0:kc]
        off = off_ref[0, pl.ds(i * cm, cm), :]
        onehot = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        g = jnp.dot(onehot.reshape(cm * kc, n), q_ref[0],
                    preferred_element_type=jnp.float32)
        h1 = g.reshape(cm, kc, c) - off[:, None, :]
        h1b = h1.astype(jnp.bfloat16)
        if e:
            h1b = jnp.concatenate(
                [h1b, jnp.broadcast_to(h1b[:, 0:1, :], (cm, e, c))],
                axis=1)
        h1_ref[0, pl.ds(i * cm, cm), :, :] = h1b
        h2d = h1.reshape(cm * kc, c)
        if e:
            h1w = h2d * w
            s, ss = acc
            return (s + jnp.sum(h1w, axis=0, keepdims=True),
                    ss + jnp.sum(h1w * h2d, axis=0, keepdims=True))
        return _acc2(acc, h2d)

    s, ss = lax.fori_loop(0, mt // cm, body, _zeros2(c))
    psum_ref[0] += jnp.concatenate([s, ss], axis=0)


def _gather_blocks(q_ref, idx, s, nb, lane, cm, k, w):
    """Windowed gather: one one-hot matmul over the chunk's [s, s+w)
    window of Q, or the sum over all n//w statically-unrolled blocks
    for chunks whose span overflows (non-matching blocks contribute
    exact 0 — both branches compute the same sums). No dynamic-trip
    loops: Mosaic lowers those to un-pipelined while loops."""
    n, c = q_ref.shape[1], q_ref.shape[2]

    def blk(base):
        qw = q_ref[0, pl.ds(base, w), :]
        onehot = (lane == (idx - base)[:, :, None]).astype(jnp.bfloat16)
        return jnp.dot(onehot.reshape(cm * k, w), qw,
                       preferred_element_type=jnp.float32)

    def narrow(_):
        return blk(pl.multiple_of(s, 8))

    def wide(_):
        acc = blk(0)
        for j in range(1, n // w):
            acc += blk(j * w)
        return acc

    return lax.cond(nb == 1, narrow, wide, 0)


@pin_default_matmul_precision
def _k_f1w(s_ref, nb_ref, q_ref, idx_ref, off_ref, h1_ref, psum_ref,
           *, cm: int, w: int, e: int = 0):
    """Windowed gather pass: rows are pre-clustered (σ); each chunk
    reads only its [s, s+w) window of Q (or loops all blocks when its
    span overflows) — exact for any input order. Slot-capped like
    _k_f1 when e > 0 (windows were planned on the full idx, a superset
    of the capped slots' indices — replicas equal slot 0's index)."""
    c = q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    kc = k - e
    _psum_init(psum_ref)
    nch = mt // cm
    pid = pl.program_id(0)
    lane = lax.broadcasted_iota(jnp.int32, (cm, kc, w), 2)
    wt = _slot_w(cm, kc, e) if e else None

    def body(i, acc):
        idx = idx_ref[0, pl.ds(i * cm, cm), :][:, 0:kc]
        off = off_ref[0, pl.ds(i * cm, cm), :]
        g = _gather_blocks(q_ref, idx, s_ref[pid * nch + i],
                           nb_ref[pid * nch + i], lane, cm, kc, w)
        h1 = g.reshape(cm, kc, c) - off[:, None, :]
        h1b = h1.astype(jnp.bfloat16)
        if e:
            h1b = jnp.concatenate(
                [h1b, jnp.broadcast_to(h1b[:, 0:1, :], (cm, e, c))],
                axis=1)
        h1_ref[0, pl.ds(i * cm, cm), :, :] = h1b
        h2d = h1.reshape(cm * kc, c)
        if e:
            h1w = h2d * wt
            sm, ss = acc
            return (sm + jnp.sum(h1w, axis=0, keepdims=True),
                    ss + jnp.sum(h1w * h2d, axis=0, keepdims=True))
        return _acc2(acc, h2d)

    sm, ss = lax.fori_loop(0, nch, body, _zeros2(c))
    psum_ref[0] += jnp.concatenate([sm, ss], axis=0)


@pin_default_matmul_precision
def _k_stats2(h1_ref, st1_ref, w2_ref, psum_ref, *, cm: int, e: int = 0,
              sm: int = 0):
    """Σ/Σ² of h2 = relu(BN1(h1))·W2 (nothing written but the sums).
    The block's slot dim may be capped at kc < k; each row's slot 0
    then carries weight 1+e for the e unread replicas (see the slot
    capping note above _kc_variants). ``sm``: h1 arrives SLOT-major
    ([1, kc, mt, c1] — the bq kernel's native layout, r5): chunks
    slice the m dim and rows run slot-outer; the sums are row-order
    free, so only the reads and the slot-0 weights change."""
    if sm:
        kc, mt, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    else:
        mt, kc, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    c2 = w2_ref.shape[1]
    _psum_init(psum_ref)
    w = _slot_w(cm, kc, e, sm) if e else None

    def body(i, acc):
        if sm:
            h1 = h1_ref[0, :, pl.ds(i * cm, cm), :]
            h1 = h1.astype(jnp.float32).reshape(kc * cm, c1)
        else:
            h1 = h1_ref[0, pl.ds(i * cm, cm), :, :]
            h1 = h1.astype(jnp.float32).reshape(cm * kc, c1)
        y1 = _bn_relu2(h1, st1_ref)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        h2w = h2 * w if e else h2
        s, ss = acc
        return (s + jnp.sum(h2w, axis=0, keepdims=True),
                ss + jnp.sum(h2w * h2, axis=0, keepdims=True))

    s, ss = lax.fori_loop(0, mt // cm, body, _zeros2(c2))
    psum_ref[0] += jnp.concatenate([s, ss], axis=0)


@pin_default_matmul_precision
def _k_stats3(h1_ref, st1_ref, st2_ref, w2_ref, w3_ref, psum_ref,
              *, cm: int, e: int = 0, sm: int = 0):
    """Σ/Σ² of h3, recomputed from h1 (slot-capped like _k_stats2;
    ``sm`` reads the slot-major layout like _k_stats2)."""
    if sm:
        kc, mt, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    else:
        mt, kc, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    c3 = w3_ref.shape[1]
    _psum_init(psum_ref)
    w = _slot_w(cm, kc, e, sm) if e else None

    def body(i, acc):
        if sm:
            h1 = h1_ref[0, :, pl.ds(i * cm, cm), :]
            h1 = h1.astype(jnp.float32).reshape(kc * cm, c1)
        else:
            h1 = h1_ref[0, pl.ds(i * cm, cm), :, :]
            h1 = h1.astype(jnp.float32).reshape(cm * kc, c1)
        _, _, y2 = _fwd_to(h1, st1_ref, st2_ref, w2_ref)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        h3w = h3 * w if e else h3
        s, ss = acc
        return (s + jnp.sum(h3w, axis=0, keepdims=True),
                ss + jnp.sum(h3w * h3, axis=0, keepdims=True))

    s, ss = lax.fori_loop(0, mt // cm, body, _zeros2(c3))
    psum_ref[0] += jnp.concatenate([s, ss], axis=0)


@pin_default_matmul_precision
def _k_out(h1_ref, st1_ref, st2_ref, st3_ref, w2_ref, w3_ref, out_ref,
           *, cm: int, sm: int = 0):
    """out = max_k relu(BN3(h3)), recomputed from h1. ``sm``: h1 is
    slot-major — the max runs down the leading slot axis; the [B,M,C3]
    output layout is unchanged (padded replica slots repeat slot 0 and
    never change a max, so capped kc blocks are exact either way)."""
    if sm:
        k, mt, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    else:
        mt, k, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    c3 = w3_ref.shape[1]

    def body(i, _):
        if sm:
            h1 = h1_ref[0, :, pl.ds(i * cm, cm), :]
            h1 = h1.astype(jnp.float32).reshape(k * cm, c1)
        else:
            h1 = h1_ref[0, pl.ds(i * cm, cm), :, :]
            h1 = h1.astype(jnp.float32).reshape(cm * k, c1)
        _, _, y2 = _fwd_to(h1, st1_ref, st2_ref, w2_ref)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        y3 = _bn_relu2(h3, st3_ref)
        pooled = (jnp.max(y3.reshape(k, cm, c3), axis=0) if sm
                  else jnp.max(y3.reshape(cm, k, c3), axis=1))
        out_ref[0, pl.ds(i * cm, cm), :] = pooled
        return 0

    lax.fori_loop(0, mt // cm, body, 0)


@pin_default_matmul_precision
def _k_eval(q_ref, idx_ref, off_ref, st1_ref, st2_ref, st3_ref,
            w2_ref, w3_ref, out_ref, *, cm: int, e: int = 0):
    """Eval: gather → chain → max in one kernel (running stats given).

    Slot-capped (e > 0, under the max(cnt) <= kc branch): slots >= kc
    are repeat-padding replicas of slot 0 and cannot raise the max, so
    the whole chain runs on kc = k − e slots only — EXACTLY equal to
    the full-k result (eval has no batch statistics)."""
    n, c1 = q_ref.shape[1], q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    kc = k - e
    c3 = w3_ref.shape[1]

    lane = lax.broadcasted_iota(jnp.int32, (cm, kc, n), 2)

    def body(i, _):
        idx = idx_ref[0, pl.ds(i * cm, cm), :][:, 0:kc]
        off = off_ref[0, pl.ds(i * cm, cm), :]
        onehot = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        g = jnp.dot(onehot.reshape(cm * kc, n), q_ref[0],
                    preferred_element_type=jnp.float32)
        h1 = (g.reshape(cm, kc, c1) - off[:, None, :]).reshape(
            cm * kc, c1)
        _, _, y2 = _fwd_to(h1, st1_ref, st2_ref, w2_ref)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        y3 = _bn_relu2(h3, st3_ref)
        out_ref[0, pl.ds(i * cm, cm), :] = jnp.max(
            y3.reshape(cm, kc, c3), axis=1)
        return 0

    lax.fori_loop(0, mt // cm, body, 0)


@pin_default_matmul_precision
def _k_evalw(s_ref, nb_ref, q_ref, idx_ref, off_ref, st1_ref, st2_ref,
             st3_ref, w2_ref, w3_ref, out_ref, *, cm: int, w: int,
             e: int = 0):
    """Windowed eval kernel (see _k_f1w; slot-capped like _k_eval)."""
    c1 = q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    kc = k - e
    c3 = w3_ref.shape[1]
    nch = mt // cm
    pid = pl.program_id(0)
    lane = lax.broadcasted_iota(jnp.int32, (cm, kc, w), 2)

    def body(i, _):
        idx = idx_ref[0, pl.ds(i * cm, cm), :][:, 0:kc]
        off = off_ref[0, pl.ds(i * cm, cm), :]
        g = _gather_blocks(q_ref, idx, s_ref[pid * nch + i],
                           nb_ref[pid * nch + i], lane, cm, kc, w)
        h1 = (g.reshape(cm, kc, c1) - off[:, None, :]).reshape(
            cm * kc, c1)
        _, _, y2 = _fwd_to(h1, st1_ref, st2_ref, w2_ref)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        y3 = _bn_relu2(h3, st3_ref)
        out_ref[0, pl.ds(i * cm, cm), :] = jnp.max(
            y3.reshape(cm, kc, c3), axis=1)
        return 0

    lax.fori_loop(0, nch, body, 0)


# ------------------------------------------------------------ bwd kernels
#
# Two passes instead of one per BN level: the BN backward needs global
# sums before any per-row gradient exists, which naively chains four
# passes (S3 → dW3/S2 → dW2/S1 → dQ). But dh = (γ/σ)(dz − Σdz/R −
# x̂·Σdzx̂/R) is AFFINE in the unknown sums, so every quantity built
# from dh3 factors into row-contractions that can be accumulated
# BEFORE S3 is known and combined in XLA afterwards:
#
#   P1 accumulates, per chunk, one [3·C2, 2·C3] matmul
#   ([y2 ‖ m2 ‖ m2·x̂2]ᵀ · [dz3 ‖ x̂3]) plus row sums — enough to derive
#   S3 (=dβ3/dγ3), dW3, and the BN2 sums S2 in XLA;
#   P2 (with S3, S2 now known) computes per-row dh2/dz1 directly,
#   accumulates dW2, S1, and the scatter pieces
#   onehotᵀ·[dz1 ‖ x̂1 ‖ 1] plus the per-center sums Σₖdz1 / Σₖx̂1 —
#   dQ and dOff are affine in the still-unknown S1 and assembled in
#   XLA: dQ = sc1·(Σo·dz1 − cnt·u1 − Σo·x̂1·u2).


@pin_default_matmul_precision
def _k_p1(h1_ref, dout_ref, st1_ref, st2_ref, st3_ref, w2_ref, w3_ref,
          ps3_ref, ps2_ref, mats_ref, *, cm: int, e: int = 0,
          sm: int = 0):
    """Backward pass 1: S3 sums + the 6 row-contraction accumulators.
    Slot-capped blocks (e > 0) weight each row's slot 0 by 1+e in every
    row sum — the replica rows' contributions are identical to slot
    0's (see the note above _kc_variants). ``sm``: h1 is slot-major;
    the contractions pair left/right rows in the same (slot-major)
    order, so only reads, the maxpool axis, and the slot-0 picks
    change."""
    if sm:
        k, mt, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    else:
        mt, k, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    c2 = w2_ref.shape[1]
    c3 = w3_ref.shape[1]
    _psum_init(ps3_ref)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ps2_ref[0] = jnp.zeros_like(ps2_ref[0])
        mats_ref[0] = jnp.zeros_like(mats_ref[0])

    contract = (((0,), (0,)), ((), ()))
    w = _slot_w(cm, k, e, sm) if e else None

    def body(i, acc):
        s, ss, vecs, mats = acc
        if sm:
            h1 = h1_ref[0, :, pl.ds(i * cm, cm), :]
            h1 = h1.astype(jnp.float32).reshape(k * cm, c1)
        else:
            h1 = h1_ref[0, pl.ds(i * cm, cm), :, :]
            h1 = h1.astype(jnp.float32).reshape(cm * k, c1)
        dout = dout_ref[0, pl.ds(i * cm, cm), :]
        y1 = _bn_relu2(h1, st1_ref)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        y2, z2 = _bn_relu2(h2, st2_ref, with_z=True)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        dz3 = _maxpool_dz(h3, dout, st3_ref, cm, k, e, sm)
        xh3 = _xhat(h3, st3_ref)
        m2 = (z2 > 0).astype(jnp.float32)
        xh2 = _xhat(h2, st2_ref)
        left = jnp.concatenate([y2, m2, m2 * xh2], axis=1)   # [rows, 3C2]
        right = jnp.concatenate([dz3, xh3], axis=1)          # [rows, 2C3]
        dz3w = dz3 * w if e else dz3
        leftw = left * w if e else left
        leftb = left.astype(jnp.bfloat16)
        rightb = right.astype(jnp.bfloat16)
        mats = mats + lax.dot_general(
            leftb, rightb, contract, preferred_element_type=jnp.float32)
        if e:
            mats = mats + float(e) * lax.dot_general(
                _slot0(leftb, cm, k, sm), _slot0(rightb, cm, k, sm),
                contract, preferred_element_type=jnp.float32)
        return (s + jnp.sum(dz3w, axis=0, keepdims=True),
                ss + jnp.sum(dz3w * xh3, axis=0, keepdims=True),
                vecs + jnp.sum(leftw, axis=0, keepdims=True),
                mats)

    s, ss, vecs, mats = lax.fori_loop(
        0, mt // cm, body,
        _zeros2(c3) + (jnp.zeros((1, 3 * c2), jnp.float32),
                       jnp.zeros((3 * c2, 2 * c3), jnp.float32)))
    ps3_ref[0] += jnp.concatenate([s, ss], axis=0)
    ps2_ref[0] += vecs
    mats_ref[0] += mats


@pin_default_matmul_precision
def _k_p2(h1_ref, dout_ref, idx_ref, st1_ref, st2_ref, st3_ref,
          w2_ref, w3_ref, wt3_ref, wt2_ref, us3_ref, us2_ref,
          dw2_ref, ps1_ref, scat_ref, d1_ref, d2_ref, *, cm: int,
          e: int = 0, sm: int = 0):
    """Backward pass 2: dW2, S1 sums, and the dQ/dOff scatter pieces.
    us3/us2 are the pre-divided BN sums (Σ/R). Slot-capped blocks
    (e > 0): h1 carries kc slots, idx stays k-wide and is sliced; slot
    0 is weighted 1+e in every row sum and in the scatter — padded
    replicas scatter to the same column (idx[:, 0]) with identical
    values, so the weighting is exact. ``sm``: h1 arrives slot-major
    ([1, kc, mt, c1]); idx stays row-major and each [cm, kc] chunk is
    transposed in-kernel so one-hot rows share h1's slot-major row
    order and the contractions are unchanged."""
    if sm:
        kc, mt, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    else:
        mt, kc, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    c2 = w2_ref.shape[1]
    n = scat_ref.shape[1]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        ps1_ref[0] = jnp.zeros_like(ps1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])

    @pl.when(pl.program_id(1) == 0)
    def _():
        scat_ref[0] = jnp.zeros_like(scat_ref[0])

    contract = (((0,), (0,)), ((), ()))
    lane = lax.broadcasted_iota(
        jnp.int32, (kc, cm, n) if sm else (cm, kc, n), 2)
    wrow = _slot_w(cm, kc, e, sm) if e else None
    # MXU output lanes pad to 128-tiles: [dz1 ‖ xh1 ‖ ones8] = 2c1+8
    # costs a whole extra tile for 8 integer-count columns. When 2c1 is
    # tile-aligned, ship [dz1 ‖ xh1] alone and derive the counts from a
    # slot-summed one-hot S [cm, w] (integers ≤ k: bf16-exact) dotted
    # with ones over the cm-contraction — ~1% of the main matmul. The
    # products are identical integers → bit-exact vs the ones8 column.
    split_cnt = _split_cnt(c1)
    ones8 = (jnp.ones((cm, 8), jnp.bfloat16) if split_cnt
             else jnp.ones((cm * kc, 8), jnp.bfloat16))

    def body(i, acc):
        dw2, s, ss = acc
        if sm:
            h1 = h1_ref[0, :, pl.ds(i * cm, cm), :]
            h1 = h1.astype(jnp.float32).reshape(kc * cm, c1)
            # idx stays ROW-major even on the sm path: chunks slice its
            # SUBLANE dim (legal); a [b,kc,m] layout would put m on the
            # lane dim, and pl.ds there needs 128-multiple starts
            # (Mosaic rejects cm<128 chunks — r5 headline compile
            # failure). The [cm,kc] i32 chunk transpose is VPU-cheap.
            idx = idx_ref[0, pl.ds(i * cm, cm), :][:, :kc].T  # [kc, cm]
        else:
            h1 = h1_ref[0, pl.ds(i * cm, cm), :, :]
            h1 = h1.astype(jnp.float32).reshape(cm * kc, c1)
            idx = idx_ref[0, pl.ds(i * cm, cm), :][:, :kc]
        dout = dout_ref[0, pl.ds(i * cm, cm), :]
        y1, z1 = _bn_relu2(h1, st1_ref, with_z=True)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        y2, z2 = _bn_relu2(h2, st2_ref, with_z=True)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        dz3 = _maxpool_dz(h3, dout, st3_ref, cm, kc, e, sm)
        dh3 = _bn_bwd_row(dz3, _xhat(h3, st3_ref), st3_ref, us3_ref, 1.0)
        dy2 = jnp.dot(dh3.astype(jnp.bfloat16), wt3_ref[:, :],
                      preferred_element_type=jnp.float32)
        dz2 = jnp.where(z2 > 0, dy2, 0.0)
        dh2 = _bn_bwd_row(dz2, _xhat(h2, st2_ref), st2_ref, us2_ref, 1.0)
        y1b = y1.astype(jnp.bfloat16)
        dh2b = dh2.astype(jnp.bfloat16)
        dw2 = dw2 + lax.dot_general(
            y1b, dh2b, contract, preferred_element_type=jnp.float32)
        if e:
            dw2 = dw2 + float(e) * lax.dot_general(
                _slot0(y1b, cm, kc, sm), _slot0(dh2b, cm, kc, sm),
                contract, preferred_element_type=jnp.float32)
        dy1 = jnp.dot(dh2.astype(jnp.bfloat16), wt2_ref[:, :],
                      preferred_element_type=jnp.float32)
        dz1 = jnp.where(z1 > 0, dy1, 0.0)
        xh1 = _xhat(h1, st1_ref)
        dz1w = dz1 * wrow if e else dz1
        xh1w = xh1 * wrow if e else xh1

        if sm:
            d1_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
                dz1w.reshape(kc, cm, c1), axis=0)
            d2_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
                xh1w.reshape(kc, cm, c1), axis=0)
        else:
            d1_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
                dz1w.reshape(cm, kc, c1), axis=1)
            d2_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
                xh1w.reshape(cm, kc, c1), axis=1)
        onehot3 = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        onehot = onehot3.reshape(kc * cm if sm else cm * kc, n)
        if split_cnt:
            right = jnp.concatenate(
                [dz1.astype(jnp.bfloat16), xh1.astype(jnp.bfloat16)],
                axis=1)
        else:
            right = jnp.concatenate(
                [dz1.astype(jnp.bfloat16), xh1.astype(jnp.bfloat16),
                 ones8], axis=1)
        # accumulate straight into the (VMEM-resident) output block —
        # an [N, 2C1+8] loop carry would double the footprint
        scat = lax.dot_general(
            onehot, right, contract, preferred_element_type=jnp.float32)
        if e:
            scat = scat + float(e) * lax.dot_general(
                _slot0(onehot, cm, kc, sm), _slot0(right, cm, kc, sm),
                contract, preferred_element_type=jnp.float32)
        if split_cnt:
            # per-center source counts [cm, n] (integers ≤ k)
            sslot = jnp.sum(onehot3, axis=0 if sm else 1)
            if e:
                sslot = sslot + float(e) * (
                    onehot3[0] if sm else onehot3[:, 0, :])
            cnt8 = lax.dot_general(
                sslot.astype(jnp.bfloat16), ones8, contract,
                preferred_element_type=jnp.float32)    # [n, 8]
            scat_ref[0, :, : 2 * c1] += scat
            scat_ref[0, :, 2 * c1:] += cnt8
        else:
            scat_ref[0] += scat
        return (dw2,
                s + jnp.sum(dz1w, axis=0, keepdims=True),
                ss + jnp.sum(dz1w * xh1, axis=0, keepdims=True))

    c2_ = w2_ref.shape[1]
    dw2, s, ss = lax.fori_loop(
        0, mt // cm, body,
        (jnp.zeros((c1, c2_), jnp.float32),) + _zeros2(c1))
    dw2_ref[0] += dw2
    ps1_ref[0] += jnp.concatenate([s, ss], axis=0)


@pin_default_matmul_precision
def _k_p2w(s_ref, nb_ref, h1_ref, dout_ref, idx_ref, st1_ref, st2_ref,
           st3_ref, w2_ref, w3_ref, wt3_ref, wt2_ref, us3_ref, us2_ref,
           dw2_ref, ps1_ref, scat_ref, d1_ref, d2_ref, *, cm: int,
           w: int, e: int = 0):
    """Windowed backward pass 2 (see _k_f1w): the scatter one-hot is
    built per w-wide block and accumulated into that slice of the
    resident scatter block — one block for narrow chunks, all for
    wide ones. Slot capping as in _k_p2."""
    mt, kc, c1 = h1_ref.shape[1], h1_ref.shape[2], h1_ref.shape[3]
    nch = mt // cm
    nt = pl.num_programs(1)
    pid = pl.program_id(0) * nt + pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        ps1_ref[0] = jnp.zeros_like(ps1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])

    @pl.when(pl.program_id(1) == 0)
    def _():
        scat_ref[0] = jnp.zeros_like(scat_ref[0])

    contract = (((0,), (0,)), ((), ()))
    lane = lax.broadcasted_iota(jnp.int32, (cm, kc, w), 2)
    wrow = _slot_w(cm, kc, e) if e else None
    split_cnt = _split_cnt(c1)  # see _k_p2's split-scatter note
    ones8 = (jnp.ones((cm, 8), jnp.bfloat16) if split_cnt
             else jnp.ones((cm * kc, 8), jnp.bfloat16))

    def body(i, acc):
        dw2, sa, ss = acc
        h1 = h1_ref[0, pl.ds(i * cm, cm), :, :]
        h1 = h1.astype(jnp.float32).reshape(cm * kc, c1)
        dout = dout_ref[0, pl.ds(i * cm, cm), :]
        idx = idx_ref[0, pl.ds(i * cm, cm), :][:, :kc]
        y1, z1 = _bn_relu2(h1, st1_ref, with_z=True)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        y2, z2 = _bn_relu2(h2, st2_ref, with_z=True)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        dz3 = _maxpool_dz(h3, dout, st3_ref, cm, kc, e)
        dh3 = _bn_bwd_row(dz3, _xhat(h3, st3_ref), st3_ref, us3_ref,
                          1.0)
        dy2 = jnp.dot(dh3.astype(jnp.bfloat16), wt3_ref[:, :],
                      preferred_element_type=jnp.float32)
        dz2 = jnp.where(z2 > 0, dy2, 0.0)
        dh2 = _bn_bwd_row(dz2, _xhat(h2, st2_ref), st2_ref, us2_ref,
                          1.0)
        y1b = y1.astype(jnp.bfloat16)
        dh2b = dh2.astype(jnp.bfloat16)
        dw2 = dw2 + lax.dot_general(
            y1b, dh2b, contract, preferred_element_type=jnp.float32)
        if e:
            dw2 = dw2 + float(e) * lax.dot_general(
                _slot0(y1b, cm, kc), _slot0(dh2b, cm, kc), contract,
                preferred_element_type=jnp.float32)
        dy1 = jnp.dot(dh2.astype(jnp.bfloat16), wt2_ref[:, :],
                      preferred_element_type=jnp.float32)
        dz1 = jnp.where(z1 > 0, dy1, 0.0)
        xh1 = _xhat(h1, st1_ref)
        dz1w = dz1 * wrow if e else dz1
        xh1w = xh1 * wrow if e else xh1

        d1_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
            dz1w.reshape(cm, kc, c1), axis=1)
        d2_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
            xh1w.reshape(cm, kc, c1), axis=1)
        if split_cnt:
            right = jnp.concatenate(
                [dz1.astype(jnp.bfloat16), xh1.astype(jnp.bfloat16)],
                axis=1)
        else:
            right = jnp.concatenate(
                [dz1.astype(jnp.bfloat16), xh1.astype(jnp.bfloat16),
                 ones8], axis=1)
        right0 = _slot0(right, cm, kc) if e else None
        s = s_ref[pid * nch + i]
        nb = nb_ref[pid * nch + i]
        n = scat_ref.shape[1]

        def blk(base):
            onehot3 = (lane == (idx - base)[:, :, None]).astype(
                jnp.bfloat16)
            oh = onehot3.reshape(cm * kc, w)
            acc = lax.dot_general(
                oh, right, contract,
                preferred_element_type=jnp.float32)
            if e:
                acc = acc + float(e) * lax.dot_general(
                    _slot0(oh, cm, kc), right0, contract,
                    preferred_element_type=jnp.float32)
            if split_cnt:
                sslot = jnp.sum(onehot3, axis=1)       # [cm, w] ≤ k
                if e:
                    sslot = sslot + float(e) * onehot3[:, 0, :]
                cnt8 = lax.dot_general(
                    sslot.astype(jnp.bfloat16), ones8, contract,
                    preferred_element_type=jnp.float32)  # [w, 8]
                scat_ref[0, pl.ds(base, w), : 2 * c1] += acc
                scat_ref[0, pl.ds(base, w), 2 * c1:] += cnt8
            else:
                scat_ref[0, pl.ds(base, w), :] += acc

        @pl.when(nb == 1)
        def _():
            blk(pl.multiple_of(s, 8))

        @pl.when(nb != 1)
        def _():
            for j in range(n // w):
                blk(j * w)
        return (dw2,
                sa + jnp.sum(dz1w, axis=0, keepdims=True),
                ss + jnp.sum(dz1w * xh1, axis=0, keepdims=True))

    c2_ = w2_ref.shape[1]
    dw2, sa, ss = lax.fori_loop(
        0, nch, body,
        (jnp.zeros((c1, c2_), jnp.float32),) + _zeros2(c1))
    dw2_ref[0] += dw2
    ps1_ref[0] += jnp.concatenate([sa, ss], axis=0)


# ----------------------------------------- in-kernel ball query (round 3)


def _cumsum_lanes_sa(x):
    mt, n = x.shape
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    return x


def _bq_setup(c_ref, p_ref, r2_ref):
    """Distances, in-radius rank ramp, counts for a center tile."""
    mt = c_ref.shape[1]
    n = p_ref.shape[1]
    c = c_ref[0]
    p = p_ref[0]
    c2 = jnp.sum(c * c, axis=1, keepdims=True)
    p2 = jnp.sum(p * p, axis=1, keepdims=True)
    inner = lax.dot_general(c, p, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d2 = jnp.maximum(c2 - 2.0 * inner + p2.T, 0.0)
    maski = (d2 < r2_ref[0]).astype(jnp.int32)
    # MXU cumsum (exact integer counts; neighbors._cumsum_matmul) —
    # the log-roll shift-adds were ~10 VPU passes at n=1024
    from pointcloudlib_tpu.ops.pallas.neighbors import (
        _cumsum_matmul, _mxu_cumsum,
    )

    if n >= 256 and _mxu_cumsum():
        rank = _cumsum_matmul(maski)
    else:
        rank = _cumsum_lanes_sa(maski)
    ramp = maski * rank
    cnt = rank[:, n - 1]
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    return ramp, cnt, lane


@pin_default_matmul_precision
def _k_bqf1(r2_ref, c_ref, p_ref, q_ref, off_ref, idx_ref, h_ref,
            cnt_ref, psum_ref, *, k: int, sb: int = 1):
    """Fused ball query + gather + BN stats. The extraction mask
    ``ramp == j+1`` IS the one-hot gather row, and the adaptive slot
    bound (no tile row has more than max(cnt) in-radius points) caps
    the gather matmuls too: padded slots replicate slot 0's row —
    exactly the reference's repeat-first padding
    (misc/ops.py:321-326) — without touching Q.

    ``sb`` slots extract per loop iteration (round 4): the per-slot
    [mt, n] compare + matmul was overhead-bound (same disease the
    6 MB gather chunks fixed) — one [sb·mt, n] one-hot matmul per
    iteration amortizes it. sb | k, so the dynamic h store covers
    [j, j+sb) on the OUTER slot dim; slots past a row's cnt (or past
    this tile's max) write the repeat-first row exactly as before."""
    n, c = q_ref.shape[1], q_ref.shape[2]
    mt = c_ref.shape[1]
    ramp, cnt, lane = _bq_setup(c_ref, p_ref, r2_ref)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)
    _psum_init(psum_ref)
    off = off_ref[0]
    # empty rows (cnt==0) gather point 0, like the XLA path's idx=0
    q0 = q_ref[0, 0:1, :].astype(jnp.float32)
    nslots = jnp.minimum(jnp.max(cnt), k)
    cntc = cnt[:, None]
    si = lax.broadcasted_iota(jnp.int32, (sb, 1, 1), 0)

    def slot_block(t, carry):
        idx_out, h0, s, ss = carry
        j = t * sb
        eq = ramp[None, :, :] == (j + 1 + si)          # [sb, mt, n]
        onehot = eq.astype(jnp.bfloat16).reshape(sb * mt, n)
        g = jnp.dot(onehot, q_ref[0],
                    preferred_element_type=jnp.float32)
        raw = g.reshape(sb, mt, c) - off[None]
        h0 = jnp.where(j == 0, jnp.where(cntc > 0, raw[0], h0), h0)
        live = cntc[None] > (j + si)                   # [sb, mt, 1]
        h = jnp.where(live, raw, h0[None])
        h_ref[0, pl.ds(j, sb), :, :] = h.astype(jnp.bfloat16)
        idx_j = jnp.sum(jnp.where(eq, lane[None], 0), axis=2)
        for i in range(sb):
            idx_out = jnp.where(kcol == j + i,
                                idx_j[i][:, None], idx_out)
        h2d = h.reshape(sb * mt, c)
        return (idx_out, h0,
                s + jnp.sum(h2d, axis=0, keepdims=True),
                ss + jnp.sum(h2d * h2d, axis=0, keepdims=True))

    # h0 init = the cnt==0 fallback; rows with hits overwrite at j==0
    nblk = (nslots + sb - 1) // sb
    idx_out, h0, s, ss = lax.fori_loop(
        0, nblk, slot_block,
        (jnp.zeros((mt, k), jnp.int32),
         jnp.broadcast_to(q0 - off, (mt, c))) + _zeros2(c))

    def fill(j, carry):
        s, ss = carry
        h_ref[0, pl.ds(j, 1), :, :] = h0[None].astype(jnp.bfloat16)
        return (s + jnp.sum(h0, axis=0, keepdims=True),
                ss + jnp.sum(h0 * h0, axis=0, keepdims=True))

    s, ss = lax.fori_loop(nblk * sb, k, fill, (s, ss))

    first = idx_out[:, 0:1]
    idx_ref[0] = jnp.where(kcol < cntc, idx_out, first)
    cnt_ref[0] = cntc
    psum_ref[0] += jnp.concatenate([s, ss], axis=0)


def _slot_block(mt: int, n: int, k: int, c1: int = 0) -> int:
    """Slots per extraction-loop trip for the in-kernel ball-query
    kernels: largest sb | k whose [sb·mt, n] one-hot (+ its int32
    compare source, 6 B/elem) stays ~3.5 MB AND whose f32 per-slot-
    block temporaries (~3 copies of [sb·mt, c1]: g/raw/h in _k_bqf1,
    the widest chain stage in _k_bqeval) stay ~1.5 MB (ADVICE r4 —
    mt was sized assuming sb=1, so sb must carry its own charge).
    POINTCLOUDLIB_BQ_SB overrides for A/Bs (trace-time env read);
    the override is clamped to the largest divisor of k ≤ forced —
    sb ∤ k would run the [j, j+sb) dynamic store past the k dim."""
    import os

    forced = os.environ.get("POINTCLOUDLIB_BQ_SB")
    if forced:
        f = max(1, int(forced))
        while k % f:
            f -= 1
        return f
    for cand in (8, 4, 2):
        if (k % cand == 0 and 6 * cand * mt * n <= (7 << 19)
                and 12 * cand * mt * max(c1, 1) <= (3 << 19)):
            return cand
    return 1


def _call_bqf1(new_xyz, pts, q, off, radius, k, interpret):
    b, n, c1 = q.shape
    m = new_xyz.shape[1]
    per_row = 2 * (k * c1 * 2 + k * 4 + c1 * 4) + n * 8
    budget = (5 << 20) - 4 * n * (3 + c1)
    mt = _block_tile(m, max(8, budget // per_row))
    sb = _slot_block(mt, n, k, c1)
    r2 = jnp.full((1,), radius * radius, jnp.float32)
    nt = m // mt
    idx, h, cnt, psum = pl.pallas_call(
        functools.partial(_k_bqf1, k=k, sb=sb),
        # flat grid: _psum_init zeroes at program_id(0)==0 exactly once
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mt, 3), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, n, 3), lambda i: (i // nt, 0, 0)),
            pl.BlockSpec((1, n, c1), lambda i: (i // nt, 0, 0)),
            pl.BlockSpec((1, mt, c1), lambda i: (i // nt, i % nt, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, mt, k), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, k, mt, c1),
                         lambda i: (i // nt, 0, i % nt, 0)),
            pl.BlockSpec((1, mt, 1), lambda i: (i // nt, i % nt, 0)),
            _ps_spec(c1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, k), jnp.int32),
            jax.ShapeDtypeStruct((b, k, m, c1), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, m, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 2, c1), jnp.float32),
        ],
        interpret=interpret,
    )(r2, new_xyz.astype(jnp.float32), pts.astype(jnp.float32),
      q.astype(jnp.bfloat16), off.astype(jnp.float32))
    # h stays in the kernel's native SLOT-major layout [b, k, m, c1]
    # (round 5): every tail/backward pass reads it via the sm variants,
    # killing the 2-byte·b·k·m·c1 XLA transpose this call used to pay
    # (268 MB ≈ 0.7 ms at headline SA1)
    return idx, h, cnt[..., 0], psum


@pin_default_matmul_precision
def _k_bqeval(r2_ref, c_ref, p_ref, q_ref, off_ref, st1_ref, st2_ref,
              st3_ref, w2_ref, w3_ref, out_ref, *, k: int, sb: int = 1):
    """Eval: ball query + gather + the whole chain per slot + running
    max — padded slots replicate slot 0 and cannot change the max, so
    only max(cnt) slots run and no h checkpoint exists. ``sb`` slots
    run per loop trip (r4, as _k_bqf1): the chain is row-wise, so one
    [sb·mt] flat pass replaces sb thin ones."""
    n, c1 = q_ref.shape[1], q_ref.shape[2]
    mt = c_ref.shape[1]
    c3 = w3_ref.shape[1]
    ramp, cnt, lane = _bq_setup(c_ref, p_ref, r2_ref)
    off = off_ref[0]
    q0 = q_ref[0, 0:1, :].astype(jnp.float32)
    cntc = cnt[:, None]
    nslots = jnp.minimum(jnp.max(cnt), k)
    si = lax.broadcasted_iota(jnp.int32, (sb, 1, 1), 0)

    def chain(h):
        _, _, y2 = _fwd_to(h, st1_ref, st2_ref, w2_ref)
        h3 = jnp.dot(y2.astype(jnp.bfloat16), w3_ref[:, :],
                     preferred_element_type=jnp.float32)
        return _bn_relu2(h3, st3_ref)

    def slot_block(t, macc):
        j = t * sb
        eq = ramp[None, :, :] == (j + 1 + si)          # [sb, mt, n]
        onehot = eq.astype(jnp.bfloat16).reshape(sb * mt, n)
        g = jnp.dot(onehot, q_ref[0],
                    preferred_element_type=jnp.float32)
        # rows whose slots ran out keep their max (replicated rows
        # can't raise it); rows with cnt==0 are handled below
        raw = (g.reshape(sb, mt, c1) - off[None]).reshape(sb * mt, c1)
        y3 = chain(raw).reshape(sb, mt, c3)
        live = cntc[None] > (j + si)                   # [sb, mt, 1]
        y3 = jnp.where(live, y3, -jnp.inf)
        return jnp.maximum(macc, jnp.max(y3, axis=0))

    macc = lax.fori_loop(
        0, (nslots + sb - 1) // sb, slot_block,
        jnp.full((mt, c3), -jnp.inf, jnp.float32))
    y0 = chain(q0 - off)  # cnt==0 rows gather point 0 (XLA-path idx=0)
    out_ref[0] = jnp.where(cntc > 0, macc, y0)


def _sa_sm() -> bool:
    """Slot-major tail reads for the bq path (r5 default; kills the h1
    transpose). POINTCLOUDLIB_SA_SM=0 restores the transpose +
    row-major tails — the kill switch / A/B arm. Trace-time read."""
    import os

    return os.environ.get("POINTCLOUDLIB_SA_SM", "1") != "0"


def _bq_fwd_impl(new_xyz, pts, q, off, params: SAParams, radius, k,
                 interpret, axis_name=None, world=1):
    b, n, _ = q.shape
    m = new_xyz.shape[1]
    r = float(b * m * k * world)
    sm = _sa_sm()
    idx, h1, cnt, p1 = _call_bqf1(new_xyz, pts, q, off, radius, k,
                                  interpret)
    if not sm:
        h1 = jnp.swapaxes(h1, 1, 2)
    m1, v1 = _moments(_psum(p1[0], axis_name), r)
    st1 = _stack_stats(m1, v1, params.g1, params.b1)

    def tail(kc):
        p2 = _call_stats2(h1, st1, params.w2, interpret, kc=kc, sm=sm)
        m2, v2 = _moments(_psum(p2[0], axis_name), r)
        st2 = _stack_stats(m2, v2, params.g2, params.b2)
        p3 = _call_stats3(h1, st1, st2, params.w2, params.w3,
                          interpret, kc=kc, sm=sm)
        m3, v3 = _moments(_psum(p3[0], axis_name), r)
        st3 = _stack_stats(m3, v3, params.g3, params.b3)
        out = _call_out(h1, st1, st2, st3, params.w2, params.w3,
                        interpret, kc=kc, sm=sm)
        return out, (m2, v2, m3, v3), st2, st3

    variants = _kc_variants(k)
    if len(variants) == 1:
        out, (m2, v2, m3, v3), st2, st3 = tail(k)
        maxcnt = None
    else:
        maxcnt = _maxcnt_pred(cnt, k, axis_name)
        out, (m2, v2, m3, v3), st2, st3 = _cond_chain(
            maxcnt, variants, tail)
    stats = SAStats(m1, v1, m2, v2, m3, v3)
    return out, stats, (idx, h1, st1, st2, st3, maxcnt, sm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_sa_bq_train(new_xyz, pts, q, off, params: SAParams, radius,
                      k, interpret=False, axis_name=None, world=1):
    """Train-mode fused SA with the ball query INSIDE the gather
    kernel (_k_bqf1): the rank-extraction mask doubles as the one-hot
    gather row and the adaptive slot bound caps the gather matmuls.
    Semantics identical to ball_query + fused_sa_train (repeat-first
    padding included in the BN statistics, reference
    misc/ops.py:321-326). Grouping carries no gradient."""
    out, stats, _ = _bq_fwd_impl(new_xyz, pts, q, off, params, radius,
                                 k, interpret, axis_name, world)
    return out, stats


def _bq_train_fwd(new_xyz, pts, q, off, params, radius, k, interpret,
                  axis_name, world):
    out, stats, (idx, h1, st1, st2, st3, maxcnt, sm) = _bq_fwd_impl(
        new_xyz, pts, q, off, params, radius, k, interpret, axis_name,
        world)
    res = (idx, h1, st1, st2, st3, params, q.shape[1], None, None,
           maxcnt, sm)  # sm: h1 rides the bq kernel's slot-major
    return (out, stats), res


def _bq_train_bwd(radius, k, interpret, axis_name, world, res, cts):
    dq, doff, _, dparams, _ = _fused_train_bwd(
        interpret, axis_name, world, res, cts)
    return None, None, dq, doff, dparams


fused_sa_bq_train.defvjp(_bq_train_fwd, _bq_train_bwd)


@functools.partial(
    jax.jit, static_argnames=("radius", "k", "interpret")
)
def fused_sa_bq_eval(new_xyz, pts, q, off, params: SAParams,
                     stats: SAStats, radius, k, interpret=False):
    """Eval-mode fused SA with in-kernel ball query: slots + chain +
    running max — no h checkpoint, no idx round trip."""
    b, n, c1 = q.shape
    m = new_xyz.shape[1]
    c2 = params.w2.shape[1]
    c3 = params.w3.shape[1]
    st1 = _stack_stats(stats.m1, stats.v1, params.g1, params.b1)
    st2 = _stack_stats(stats.m2, stats.v2, params.g2, params.b2)
    st3 = _stack_stats(stats.m3, stats.v3, params.g3, params.b3)
    per_row = 2 * 4 * (c1 + c2 + c3) + n * 8
    budget = (5 << 20) - 4 * n * (3 + c1)
    mt = _block_tile(m, max(8, budget // per_row))
    r2 = jnp.full((1,), radius * radius, jnp.float32)
    return pl.pallas_call(
        functools.partial(_k_bqeval, k=k,
                          sb=_slot_block(mt, n, k, max(c1, c2, c3))),
        grid=(b, m // mt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mt, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, mt, c1), lambda i, j: (i, j, 0)),
            _st_spec(c1), _st_spec(c2), _st_spec(c3),
            _w_spec(params.w2), _w_spec(params.w3),
        ],
        out_specs=pl.BlockSpec((1, mt, c3), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, c3), jnp.float32),
        interpret=interpret,
    )(r2, new_xyz.astype(jnp.float32), pts.astype(jnp.float32),
      q.astype(jnp.bfloat16), off.astype(jnp.float32), st1, st2, st3,
      params.w2.astype(jnp.bfloat16), params.w3.astype(jnp.bfloat16))


def _stack_stats(mu, var, gam, bet):
    """Fold BN parameters+statistics into the kernel-side affine
    constants (sc, bi, rs, mrs) — see _bn_relu2."""
    rs = _rsig(var)
    sc = gam * rs
    bi = bet - mu * sc
    return jnp.stack([sc, bi, rs, mu * rs]).astype(jnp.float32)[None]


def _moments(psum, r):
    mean = psum[0] / r
    var = jnp.maximum(psum[1] / r - mean * mean, 0.0)
    return mean, var


def _st_spec(c):
    return pl.BlockSpec((1, 4, c), lambda *a: (0, 0, 0))


def _ps_spec(c):
    return pl.BlockSpec((1, 2, c), lambda *a: (0, 0, 0))


def _w_spec(w):
    return pl.BlockSpec(w.shape, lambda *a: (0, 0))


def _flat(m, mt, tail):
    nmt = m // mt
    return pl.BlockSpec(
        (1, mt) + tail, lambda i: (i // nmt, i % nmt) + (0,) * len(tail))


def _h1_dims(h1, sm):
    """(b, m, k, c1) regardless of layout: sm h1 is [b, k, m, c1]."""
    if sm:
        b, k, m, c1 = h1.shape
        return b, m, k, c1
    return h1.shape


def _flat_sm(m, mt, kc, c1):
    """Slot-major h1 block [1, kc, mt, c1] over a flat (b·m/mt,) grid:
    slot block index 0 always — a capped kc < k reads slots [0, kc)."""
    nmt = m // mt
    return pl.BlockSpec(
        (1, kc, mt, c1), lambda i: (i // nmt, 0, i % nmt, 0))


def _call_f1(q, idx, off, interpret, kc=None):
    b, n, c1 = q.shape
    _, m, k = idx.shape
    e = 0 if kc is None else k - kc
    mt = _m_tile(m, k, bf16_widths=c1)
    cm = _gchunk(mt, k, n)
    w = _window_width(n)
    out_specs = [_flat(m, mt, (k, c1)), _ps_spec(c1)]
    out_shape = [
        jax.ShapeDtypeStruct((b, m, k, c1), jnp.bfloat16),
        jax.ShapeDtypeStruct((1, 2, c1), jnp.float32),
    ]
    q_spec = pl.BlockSpec((1, n, c1), lambda i, _m=m, _mt=mt:
                          (i // (_m // _mt), 0, 0))
    if w is None:
        h1, psum = pl.pallas_call(
            functools.partial(_k_f1, cm=cm, e=e),
            grid=(b * (m // mt),),
            in_specs=[q_spec, _flat(m, mt, (k,)), _flat(m, mt, (c1,))],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(q.astype(jnp.bfloat16), idx.astype(jnp.int32),
          off.astype(jnp.float32))
        return h1, psum
    # windowed chunks budget on w, not n (see _gchunk_w)
    cm = _gchunk_w(mt, k, w, c1)
    starts, nblocks = _window_plan(idx, cm, w, n)
    h1, psum = pl.pallas_call(
        functools.partial(_k_f1w, cm=cm, w=w, e=e),
        grid=(b * (m // mt),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec, _flat(m, mt, (k,)), _flat(m, mt, (c1,)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(starts, nblocks, q.astype(jnp.bfloat16), idx.astype(jnp.int32),
      off.astype(jnp.float32))
    return h1, psum


def _call_stats2(h1, st1, w2, interpret, kc=None, sm=False):
    b, m, k, c1 = _h1_dims(h1, sm)
    kc = k if kc is None else kc
    c2 = w2.shape[1]
    mt = _m_tile(m, kc, bf16_widths=c1)
    psum = pl.pallas_call(
        functools.partial(_k_stats2, cm=_chunk(mt, kc, max(c1, c2)),
                          e=k - kc, sm=int(sm)),
        grid=(b * (m // mt),),
        in_specs=[_flat_sm(m, mt, kc, c1) if sm
                  else _flat(m, mt, (kc, c1)),
                  _st_spec(c1), _w_spec(w2)],
        out_specs=_ps_spec(c2),
        out_shape=jax.ShapeDtypeStruct((1, 2, c2), jnp.float32),
        interpret=interpret,
    )(h1, st1, w2.astype(jnp.bfloat16))
    return psum


def _call_stats3(h1, st1, st2, w2, w3, interpret, kc=None, sm=False):
    b, m, k, c1 = _h1_dims(h1, sm)
    kc = k if kc is None else kc
    c3 = w3.shape[1]
    mt = _m_tile(m, kc, bf16_widths=c1)
    psum = pl.pallas_call(
        functools.partial(_k_stats3,
                          cm=_chunk(mt, kc, max(c1, w2.shape[1], c3)),
                          e=k - kc, sm=int(sm)),
        grid=(b * (m // mt),),
        in_specs=[_flat_sm(m, mt, kc, c1) if sm
                  else _flat(m, mt, (kc, c1)),
                  _st_spec(c1), _st_spec(w2.shape[1]),
                  _w_spec(w2), _w_spec(w3)],
        out_specs=_ps_spec(c3),
        out_shape=jax.ShapeDtypeStruct((1, 2, c3), jnp.float32),
        interpret=interpret,
    )(h1, st1, st2, w2.astype(jnp.bfloat16), w3.astype(jnp.bfloat16))
    return psum


def _call_out(h1, st1, st2, st3, w2, w3, interpret, kc=None, sm=False):
    b, m, k, c1 = _h1_dims(h1, sm)
    kc = k if kc is None else kc
    c3 = w3.shape[1]
    mt = _m_tile(m, kc, bf16_widths=c1)
    return pl.pallas_call(
        functools.partial(_k_out,
                          cm=_chunk(mt, kc, max(c1, w2.shape[1], c3)),
                          sm=int(sm)),
        grid=(b * (m // mt),),
        in_specs=[_flat_sm(m, mt, kc, c1) if sm
                  else _flat(m, mt, (kc, c1)),
                  _st_spec(c1),
                  _st_spec(w2.shape[1]), _st_spec(c3),
                  _w_spec(w2), _w_spec(w3)],
        out_specs=_flat(m, mt, (c3,)),
        out_shape=jax.ShapeDtypeStruct((b, m, c3), jnp.float32),
        interpret=interpret,
    )(h1, st1, st2, st3, w2.astype(jnp.bfloat16), w3.astype(jnp.bfloat16))


def _psum(x, axis_name):
    return lax.psum(x, axis_name) if axis_name else x


def _maxcnt_pred(cnt, k, axis_name):
    """max(cnt) clamped at k, pmax'd over the DP axis so every shard
    takes the same cond branch (collectives inside diverging branches
    would deadlock)."""
    mc = jnp.minimum(jnp.max(cnt), k).astype(jnp.int32)
    if axis_name is not None:
        mc = lax.pmax(mc, axis_name)
    return mc


def _fused_fwd_impl(q, off, idx, params: SAParams, interpret,
                    axis_name=None, world=1, cnt=None):
    b, n, _ = q.shape
    _, m, k = idx.shape
    r = float(b * m * k * world)

    # windowing: cluster rows by neighbor locality so per-tile index
    # windows are tight (semantics-invisible — outputs are unpermuted)
    if _window_width(n) is not None:
        sigma, inv = _row_perm(idx)
        idx = _take_rows(idx, sigma)
        off = _take_rows(off, sigma)
    else:
        sigma = inv = None

    def tail_from(h1, st1, kc):
        p2 = _call_stats2(h1, st1, params.w2, interpret, kc=kc)
        m2, v2 = _moments(_psum(p2[0], axis_name), r)
        st2 = _stack_stats(m2, v2, params.g2, params.b2)
        p3 = _call_stats3(h1, st1, st2, params.w2, params.w3,
                          interpret, kc=kc)
        m3, v3 = _moments(_psum(p3[0], axis_name), r)
        st3 = _stack_stats(m3, v3, params.g3, params.b3)
        out = _call_out(h1, st1, st2, st3, params.w2, params.w3,
                        interpret, kc=kc)
        return out, (m2, v2, m3, v3), st2, st3

    variants = _kc_variants(k)
    if cnt is not None and len(variants) > 1 and _cap_gather():
        # the gather pass itself joins the cond chain: each rung
        # gathers only kc slots and fills the replicas (h1 stays
        # bit-identical — see _k_f1)
        maxcnt = _maxcnt_pred(cnt, k, axis_name)

        def stage(kc):
            h1, p1 = _call_f1(q, idx, off, interpret,
                              kc=kc if kc < k else None)
            m1, v1 = _moments(_psum(p1[0], axis_name), r)
            st1 = _stack_stats(m1, v1, params.g1, params.b1)
            out, moms23, st2, st3 = tail_from(h1, st1, kc)
            return out, (m1, v1) + moms23, h1, st1, st2, st3

        (out, (m1, v1, m2, v2, m3, v3), h1, st1, st2,
         st3) = _cond_chain(maxcnt, variants, stage)
    else:
        h1, p1 = _call_f1(q, idx, off, interpret)
        m1, v1 = _moments(_psum(p1[0], axis_name), r)
        st1 = _stack_stats(m1, v1, params.g1, params.b1)
        if cnt is None or len(variants) == 1:
            out, (m2, v2, m3, v3), st2, st3 = tail_from(h1, st1, k)
            maxcnt = None
        else:
            maxcnt = _maxcnt_pred(cnt, k, axis_name)
            out, (m2, v2, m3, v3), st2, st3 = _cond_chain(
                maxcnt, variants,
                functools.partial(tail_from, h1, st1))
    if sigma is not None:
        out = _take_rows(out, inv)
    stats = SAStats(m1, v1, m2, v2, m3, v3)
    return out, stats, (h1, st1, st2, st3, idx, sigma, inv, maxcnt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_sa_train(q, off, idx, params: SAParams, interpret=False,
                   axis_name=None, world=1, cnt=None):
    """Train-mode fused SA MLP.

    ``q [B,N,C1]`` = points ⋅ W1 (the first Dense pre-applied in XLA so
    the gather is MXU-lane wide), ``off [B,M,C1]`` = the recentering
    offset ``new_xyz ⋅ W1[:3]``, ``idx [B,M,K]`` neighbor indices (all
    valid — ball query pads by repetition, and those repeats are part
    of the BN statistics exactly as in the reference). Returns
    ``(out [B,M,C3], SAStats)``; the stats outputs feed the running BN
    update and are not differentiated.

    ``cnt [B,M]`` (optional) = the ball query's per-center in-radius
    counts: when given, the stats/out/backward passes run slot-capped
    variants chosen at runtime by max(cnt) (see _kc_variants) — exact,
    because capped-away slots are repeat-padding replicas accounted for
    in closed form.

    Data parallelism: call inside ``shard_map`` with the batch sharded
    and ``axis_name``/``world`` set. BN statistics (forward moments and
    the backward dstat sums) are psum'd across the axis — sync-BN, the
    exact semantics jit-SPMD gives the unfused path. Param gradients
    are returned as this shard's partials; shard_map's transpose psums
    them at the replicated-input boundary.
    """
    out, stats, _ = _fused_fwd_impl(q, off, idx, params, interpret,
                                    axis_name, world, cnt)
    return out, stats


def _fused_train_fwd(q, off, idx, params, interpret, axis_name, world,
                     cnt=None):
    out, stats, (h1, st1, st2, st3, idx_s, sigma, inv, maxcnt) = (
        _fused_fwd_impl(q, off, idx, params, interpret, axis_name,
                        world, cnt))
    res = (idx_s, h1, st1, st2, st3, params, q.shape[1], sigma, inv,
           maxcnt, False)
    return (out, stats), res


def _call_p1(h1, dout, st1, st2, st3, w2, w3, interpret, kc=None,
             sm=False):
    b, m, k, c1 = _h1_dims(h1, sm)
    kc = k if kc is None else kc
    c2, c3 = w2.shape[1], w3.shape[1]
    mt = _m_tile(m, kc, bf16_widths=c1, f32_widths=c3 // kc + 1)
    return pl.pallas_call(
        # k>64: the 4096-row p1 variant is 0.46 MB over the 16 MB
        # scoped limit at MSG's k=128 shape (sweep-caught) — halve
        functools.partial(
            _k_p1,
            cm=_chunk(mt, kc,
                      max(c1, c2, c3) * (2 if kc > 64 else 1)),
            e=k - kc, sm=int(sm)),
        grid=(b * (m // mt),),
        in_specs=[_flat_sm(m, mt, kc, c1) if sm
                  else _flat(m, mt, (kc, c1)),
                  _flat(m, mt, (c3,)),
                  _st_spec(c1), _st_spec(c2), _st_spec(c3),
                  _w_spec(w2), _w_spec(w3)],
        out_specs=[_ps_spec(c3),
                   pl.BlockSpec((1, 1, 3 * c2), lambda *a: (0, 0, 0)),
                   pl.BlockSpec((1, 3 * c2, 2 * c3),
                                lambda *a: (0, 0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((1, 2, c3), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 3 * c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c2, 2 * c3), jnp.float32),
        ],
        interpret=interpret,
    )(h1, dout, st1, st2, st3,
      w2.astype(jnp.bfloat16), w3.astype(jnp.bfloat16))


def _combine_p1(ps3, vecs, mats, st3_folded, w3, r, axis_name=None):
    """XLA combine: dW3 (this shard's partial) and the BN2 sums (global
    across the DP axis) from P1's accumulators."""
    c2 = w3.shape[0]
    sc3 = st3_folded[0, 0]                      # γ3/σ3
    ps3_g = _psum(ps3, axis_name)
    u1 = ps3_g[0, 0] / r
    u2 = ps3_g[0, 1] / r
    c3 = w3.shape[1]

    def split(v, m_):
        vy2, vm2, vmx = (v[0, 0, :c2], v[0, 0, c2:2 * c2],
                         v[0, 0, 2 * c2:])
        return (vy2, vm2, vmx,
                m_[0, :c2, :c3], m_[0, :c2, c3:],
                m_[0, c2:2 * c2, :c3], m_[0, c2:2 * c2, c3:],
                m_[0, 2 * c2:, :c3], m_[0, 2 * c2:, c3:])

    # dW3 from this shard's rows only (shard_map psums at the boundary)
    vy2, _, _, A3, C3, _, _, _, _ = split(vecs, mats)
    dw3 = sc3[None, :] * (A3 - vy2[:, None] * u1[None, :]
                          - C3 * u2[None, :])
    # the BN2 sums couple every row globally
    _, vm2, vmx, _, _, E, G, Ep, Gp = split(
        _psum(vecs, axis_name), _psum(mats, axis_name))
    w3s = w3 * sc3[None, :]
    s2_1 = jnp.sum((E - G * u2[None, :]) * w3s, axis=1) - vm2 * (w3s @ u1)
    s2_2 = jnp.sum((Ep - Gp * u2[None, :]) * w3s, axis=1) - vmx * (w3s @ u1)
    s2 = jnp.stack([s2_1, s2_2])[None]
    return dw3, s2, ps3_g


def _call_p2(h1, dout, idx, st1, st2, st3, w2, w3, us3, us2, n,
             interpret, kc=None, sm=False):
    b, m, k, c1 = _h1_dims(h1, sm)
    kc = k if kc is None else kc
    c2, c3 = w2.shape[1], w3.shape[1]
    # the [N, 2C1+8] scatter accumulator (output block + loop carry)
    # lives in VMEM regardless of the row tile
    mt = _m_tile(m, kc, bf16_widths=c1, f32_widths=c3 // kc + 1,
                 fixed_bytes=8 * n * (2 * c1 + 8))
    w = _window_width(n)
    in_specs = [
        pl.BlockSpec((1, kc, mt, c1), lambda i, j: (i, 0, j, 0)) if sm
        else pl.BlockSpec((1, mt, kc, c1), lambda i, j: (i, j, 0, 0)),
        pl.BlockSpec((1, mt, c3), lambda i, j: (i, j, 0)),
        # idx rides ROW-major on both paths: the sm kernel transposes
        # its [cm, kc] chunks in-registers (a [1, kc, mt] layout puts m
        # on the lane dim where dynamic chunk starts are illegal)
        pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0)),
        _st_spec(c1), _st_spec(c2), _st_spec(c3),
        _w_spec(w2), _w_spec(w3),
        pl.BlockSpec((c3, c2), lambda i, j: (0, 0)),
        pl.BlockSpec((c2, c1), lambda i, j: (0, 0)),
        _ps_spec(c3), _ps_spec(c2),
    ]
    out_specs = [
        pl.BlockSpec((1, c1, c2), lambda i, j: (0, 0, 0)),
        _ps_spec(c1),
        pl.BlockSpec((1, n, 2 * c1 + 8), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, mt, c1), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, mt, c1), lambda i, j: (i, j, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, c1, c2), jnp.float32),
        jax.ShapeDtypeStruct((1, 2, c1), jnp.float32),
        jax.ShapeDtypeStruct((b, n, 2 * c1 + 8), jnp.float32),
        jax.ShapeDtypeStruct((b, m, c1), jnp.float32),
        jax.ShapeDtypeStruct((b, m, c1), jnp.float32),
    ]
    args = (h1, dout, idx.astype(jnp.int32), st1, st2, st3,
            w2.astype(jnp.bfloat16), w3.astype(jnp.bfloat16),
            jnp.swapaxes(w3, 0, 1).astype(jnp.bfloat16),
            jnp.swapaxes(w2, 0, 1).astype(jnp.bfloat16), us3, us2)
    cm = _gchunk(mt, kc, n)
    if sm:
        # the slot-major h1 chunk load (middle-dim dynamic slice of the
        # 4D block) carries more Mosaic buffering than the row-major
        # contiguous load: 4096 flat rows at c=128 — fine row-major
        # (the r4 anchor) — blows scoped VMEM by 5.9 MB in sm (caught
        # by the N=256 CLI shape, where small n inflates _gchunk).
        # Cap sm flat rows at 2048; the headline's cm (F=1024) is
        # untouched.
        cm = _divisor_tile(cm, max(1, 2048 // max(1, kc)))
    if w is None:
        dw2, ps1, scat, d1, d2 = pl.pallas_call(
            functools.partial(_k_p2, cm=cm, e=k - kc,
                              sm=int(sm)),
            grid=(b, m // mt),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
        return dw2[0], ps1, scat, d1, d2
    assert not sm, "windowed path is row-major (bq gate excludes it)"
    # windowed chunks budget on w + temporaries (see _gchunk_w); the
    # p2 kernel recomputes the chain through h2/y2 → charge max(c1, c2)
    cm = _gchunk_w(mt, kc, w, max(c1, c2))
    starts, nblocks = _window_plan(idx, cm, w, n)
    dw2, ps1, scat, d1, d2 = pl.pallas_call(
        functools.partial(_k_p2w, cm=cm, w=w, e=k - kc),
        grid=(b, m // mt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(starts, nblocks, *args)
    return dw2[0], ps1, scat, d1, d2


def _fused_train_bwd(interpret, axis_name, world, res, cts):
    (dout, _dstats) = cts  # stats feed running updates only
    idx, h1, st1, st2, st3, params, n, sigma, inv, maxcnt, sm = res
    b, m, k, c1 = _h1_dims(h1, sm)
    r = float(b * m * k * world)
    w2, w3 = params.w2, params.w3

    if sigma is not None:
        dout = _take_rows(dout, sigma)  # rows ride in σ order (as h1)

    def passes(kc):
        ps3, vecs, mats = _call_p1(h1, dout, st1, st2, st3, w2, w3,
                                   interpret, kc=kc, sm=sm)
        dw3, s2_g, ps3_g = _combine_p1(ps3, vecs, mats, st3, w3, r,
                                       axis_name)
        us3 = ps3_g / r
        us2 = s2_g / r
        dw2, ps1, scat, d1, d2 = _call_p2(
            h1, dout, idx, st1, st2, st3, w2, w3, us3, us2, n,
            interpret, kc=kc, sm=sm)
        return ps3, vecs, mats, dw3, s2_g, ps3_g, dw2, ps1, scat, d1, d2

    variants = _kc_variants(k)
    if maxcnt is None or len(variants) == 1:
        (ps3, vecs, mats, dw3, s2_g, ps3_g, dw2, ps1, scat, d1,
         d2) = passes(k)
    else:
        (ps3, vecs, mats, dw3, s2_g, ps3_g, dw2, ps1, scat, d1,
         d2) = _cond_chain(maxcnt, variants, passes)

    # dQ / dOff are affine in the (now known, global) BN1 sums
    ps1_g = _psum(ps1, axis_name)
    sc1 = st1[0, 0]
    u1 = ps1_g[0, 0] / r
    u2 = ps1_g[0, 1] / r
    scdz = scat[:, :, :c1]
    scxh = scat[:, :, c1:2 * c1]
    cnt = scat[:, :, 2 * c1:2 * c1 + 1]
    dq = sc1 * (scdz - cnt * u1[None, None, :] - scxh * u2[None, None, :])
    if sigma is not None:  # d1/d2 are per-center rows in σ order
        d1 = _take_rows(d1, inv)
        d2 = _take_rows(d2, inv)
    doff = -sc1 * (d1 - float(k) * u1[None, None, :]
                   - d2 * u2[None, None, :])

    # param grads are this shard's partials: dγ/dβ are the LOCAL dstat
    # sums; s2's local partial is recovered from the global by the same
    # linearity (cheaper: recompute from local mats)
    if axis_name is not None:
        # local S2 partial for dγ2/dβ2: same linear combine as the
        # global one but with this shard's E/G/F and the GLOBAL u-terms
        c2 = w3.shape[0]
        c3 = w3.shape[1]
        vm2 = vecs[0, 0, c2:2 * c2]
        vmx = vecs[0, 0, 2 * c2:]
        E, G = mats[0, c2:2 * c2, :c3], mats[0, c2:2 * c2, c3:]
        Ep, Gp = mats[0, 2 * c2:, :c3], mats[0, 2 * c2:, c3:]
        sc3 = st3[0, 0]
        w3s = w3 * sc3[None, :]
        u1_3 = ps3_g[0, 0] / r
        u2_3 = ps3_g[0, 1] / r
        s2_l1 = jnp.sum((E - G * u2_3[None, :]) * w3s, axis=1) \
            - vm2 * (w3s @ u1_3)
        s2_l2 = jnp.sum((Ep - Gp * u2_3[None, :]) * w3s, axis=1) \
            - vmx * (w3s @ u1_3)
        g2_grad, b2_grad = s2_l2, s2_l1
    else:
        g2_grad, b2_grad = s2_g[0, 1], s2_g[0, 0]

    dparams = SAParams(
        w2=dw2, w3=dw3,
        g1=ps1[0, 1], b1=ps1[0, 0],
        g2=g2_grad, b2=b2_grad,
        g3=ps3[0, 1], b3=ps3[0, 0],
    )
    return dq, doff, None, dparams, None  # None cnt cotangent


fused_sa_train.defvjp(_fused_train_fwd, _fused_train_bwd)


def fused_sa_reference(q, off, idx, params: SAParams):
    """Pure-jnp replica of the fused train-mode math, including every
    rounding the kernels perform (bf16 gather operand, bf16 h1
    checkpoint, bf16 matmul inputs; h2/h3 recomputed in f32).
    Differentiable by jax AD — the test oracle for the hand-written
    VJP, and executable documentation of the kernel semantics."""
    b, n, c1 = q.shape
    _, m, k = idx.shape

    def bf(x):
        return x.astype(jnp.bfloat16).astype(jnp.float32)

    g = jnp.take_along_axis(
        bf(q), idx.reshape(b, m * k)[..., None], axis=1
    ).reshape(b, m, k, c1)
    h1 = g - off[:, :, None, :]

    def moments(h):
        flat = h.reshape(-1, h.shape[-1])
        mean = jnp.mean(flat, axis=0)
        var = jnp.maximum(jnp.mean(flat * flat, axis=0) - mean ** 2, 0.0)
        return mean, var

    def bn_relu(h, stats, gam, bet):
        mean, var = stats
        z = gam * (h - mean) * _rsig(var) + bet
        return jnp.maximum(z, 0.0)

    # stats of h1 are accumulated BEFORE the bf16 checkpoint rounding;
    # every recompute pass then reads the rounded h1
    s1 = moments(h1)
    y1 = bn_relu(bf(h1), s1, params.g1, params.b1)
    h2 = jnp.einsum(
        "bmkc,cd->bmkd", y1.astype(jnp.bfloat16),
        params.w2.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    s2 = moments(h2)
    y2 = bn_relu(h2, s2, params.g2, params.b2)
    h3 = jnp.einsum(
        "bmkc,cd->bmkd", y2.astype(jnp.bfloat16),
        params.w3.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    s3 = moments(h3)
    y3 = bn_relu(h3, s3, params.g3, params.b3)
    out = jnp.max(y3, axis=2)
    return out, SAStats(s1[0], s1[1], s2[0], s2[1], s3[0], s3[1])


def fused_sa_eval(q, off, idx, params, stats, interpret=False,
                  cnt=None):
    """Eval-mode fused SA MLP (jit-cached per route-gate values — see
    neighbors._gate_key: the gates are read at trace time)."""
    from pointcloudlib_tpu.ops.pallas.neighbors import _gate_key

    return _fused_sa_eval_jit(
        q, off, idx, params, stats, interpret=interpret, cnt=cnt,
        _gates=_gate_key("POINTCLOUDLIB_CAP_GATHER",
                         "POINTCLOUDLIB_SA_WINDOW",
                         "POINTCLOUDLIB_SA_RUNGS"))


@functools.partial(jax.jit, static_argnames=("interpret", "_gates"))
def _fused_sa_eval_jit(q, off, idx, params: SAParams, stats: SAStats,
                       interpret=False, cnt=None, _gates=()):
    """Eval-mode fused SA MLP: one kernel, given (running) stats.

    ``cnt`` (the ball query's per-center counts): when given and the
    gather-cap gate is on, the whole gather→chain→max runs on only the
    runtime-selected kc slots — EXACT (capped-away slots are repeat
    padding and cannot raise the max; eval has no batch statistics)."""
    b, n, c1 = q.shape
    _, m, k = idx.shape
    c2 = params.w2.shape[1]
    c3 = params.w3.shape[1]
    st1 = _stack_stats(stats.m1, stats.v1, params.g1, params.b1)
    st2 = _stack_stats(stats.m2, stats.v2, params.g2, params.b2)
    st3 = _stack_stats(stats.m3, stats.v3, params.g3, params.b3)
    mt = _m_tile(m, k, bf16_widths=c1)
    cm = _gchunk(mt, k, n)
    w = _window_width(n)
    q_spec = pl.BlockSpec((1, n, c1), lambda i, _m=m, _mt=mt:
                          (i // (_m // _mt), 0, 0))
    tail_specs = [
        _flat(m, mt, (k,)),
        _flat(m, mt, (c1,)),
        _st_spec(c1), _st_spec(c2), _st_spec(c3),
        _w_spec(params.w2), _w_spec(params.w3),
    ]
    if w is None:
        def run(kc):
            return pl.pallas_call(
                functools.partial(_k_eval, cm=cm, e=k - kc),
                grid=(b * (m // mt),),
                in_specs=[q_spec] + tail_specs,
                out_specs=_flat(m, mt, (c3,)),
                out_shape=jax.ShapeDtypeStruct((b, m, c3), jnp.float32),
                interpret=interpret,
            )(q.astype(jnp.bfloat16), idx.astype(jnp.int32),
              off.astype(jnp.float32), st1, st2, st3,
              params.w2.astype(jnp.bfloat16),
              params.w3.astype(jnp.bfloat16))

        variants = _kc_variants(k)
        if cnt is None or len(variants) == 1 or not _cap_gather():
            return run(k)
        return _cond_chain(_maxcnt_pred(cnt, k, None), variants, run)
    sigma, inv = _row_perm(idx)
    idx = _take_rows(idx, sigma)
    off = _take_rows(off, sigma)
    # eval runs the full chain in-kernel → charge max(c1..c3) temps
    cm = _gchunk_w(mt, k, w, max(c1, c2, c3))
    starts, wide = _window_plan(idx, cm, w, n)

    def runw(kc):
        return pl.pallas_call(
            functools.partial(_k_evalw, cm=cm, w=w, e=k - kc),
            grid=(b * (m // mt),),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      q_spec] + tail_specs,
            out_specs=_flat(m, mt, (c3,)),
            out_shape=jax.ShapeDtypeStruct((b, m, c3), jnp.float32),
            interpret=interpret,
        )(starts, wide, q.astype(jnp.bfloat16), idx.astype(jnp.int32),
          off.astype(jnp.float32), st1, st2, st3,
          params.w2.astype(jnp.bfloat16), params.w3.astype(jnp.bfloat16))

    variants = _kc_variants(k)
    if cnt is None or len(variants) == 1 or not _cap_gather():
        out = runw(k)
    else:
        out = _cond_chain(_maxcnt_pred(cnt, k, None), variants, runw)
    return _take_rows(out, inv)
