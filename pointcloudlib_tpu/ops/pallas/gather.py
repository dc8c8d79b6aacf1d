"""Neighbor-gather as a Pallas TPU kernel.

``[B, N, C] × [B, M, K] → [B, M, K, C]`` batched row gathers are the
backbone of every grouping op, and XLA's TPU lowering of
``take_along_axis`` for narrow rows (C = 3…128) is catastrophically slow
(sub-tile-width gathers, ~100 ms where the arithmetic bound is <1 ms).

This kernel re-expresses the gather as an MXU matmul per tile: for a
[Mt·K] block of indices, build the one-hot selection matrix directly in
VMEM (lane-iota == index) and multiply it with the [N, C] point block.
The one-hot never touches HBM (the naive jnp one-hot materializes
B·M·K·N — gigabytes), and the multiply runs at MXU speed.

Precision: the selection matrix is exactly representable in bf16; the
gathered values are kept near f32 accuracy by a hi/lo split (two bf16
matmuls). The lo term is itself bf16-rounded, so results match the XLA
gather to ~2^-17 RELATIVE (measured max |Δ| ≈ 1.5e-5 on N(0,1) data) —
not 1 ulp; write parity tests against that envelope.

Cost: 2·M·K·N·C FLOPs — for PointNet++ SA1 (64×512×64 gathers from
1024×6) ≈ 52 GFLOP ≈ 0.6 ms at bf16, vs ~90 ms for the XLA gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from pointcloudlib_tpu.ops.pallas.prec import pin_default_matmul_precision
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


@pin_default_matmul_precision
def _gather_kernel(pts_ref, idx_ref, out_ref):
    """pts [1, N, C] f32, idx [1, Mt, K] i32 → out [1, Mt, K, C] f32."""
    n, c = pts_ref.shape[1], pts_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    # lane-preserving construction (Mosaic can't reshape across lanes):
    # compare in [mt, k, n], then collapse the leading dims only.
    lane = lax.broadcasted_iota(jnp.int32, (mt, k, n), 2)
    onehot = (lane == idx_ref[0][:, :, None]).astype(jnp.bfloat16)
    onehot = onehot.reshape(mt * k, n)
    pts = pts_ref[0]
    hi = pts.astype(jnp.bfloat16)
    lo = (pts - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    vals = jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
    vals += jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
    out_ref[0] = vals.reshape(mt, k, c)


@pin_default_matmul_precision
def _scatter_kernel(g_ref, idx_ref, out_ref):
    """Transposed gather (scatter-add): g [1,Mt,K,C], idx [1,Mt,K] →
    accumulate into out [1,N,C] across the M-tile grid dimension."""
    n = out_ref.shape[1]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    c = g_ref.shape[3]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.zeros((n, c), jnp.float32)

    lane = lax.broadcasted_iota(jnp.int32, (mt, k, n), 2)
    onehot = (lane == idx_ref[0][:, :, None]).astype(jnp.bfloat16)
    onehot = onehot.reshape(mt * k, n)
    g = g_ref[0].reshape(mt * k, c)
    hi = g.astype(jnp.bfloat16)
    lo = (g - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    contract = (((0,), (0,)), ((), ()))
    acc = lax.dot_general(onehot, hi, contract,
                          preferred_element_type=jnp.float32)
    acc += lax.dot_general(onehot, lo, contract,
                           preferred_element_type=jnp.float32)
    out_ref[0] += acc


_VMEM_BUDGET = 12 << 20  # conservative vs the 16 MB scoped-vmem limit


def _footprint(mt: int, k: int, n: int, c: int) -> int:
    """Model of the scatter/gather kernel's scoped-VMEM bytes at tile
    size ``mt``. Counts what the round-3 budget missed: the in-kernel
    [mt·k, n] iota (i32) + one-hot (bf16), the hi/lo bf16 splits, the
    f32 [n, c_lane-padded] accumulator, and the double-buffered value
    blocks. Calibrated against the compiler's 17.28 MB report at
    (mt=128, k=8, n=2048, c=131) — the model reads ~19.9 MB there, a
    ~15% overestimate, which is the right side to err on."""
    c_pad = -(-c // 128) * 128
    per_row = k * n * 6 + k * c_pad * 12
    fixed = n * c_pad * 8
    return mt * per_row + fixed


def _tile_m(m: int, k: int, n: int, c: int) -> int:
    # tile M so the one-hot block [Mt*K, N] stays ~2MB in VMEM AND the
    # full kernel footprint (iota + one-hot + accumulator + blocks)
    # fits the scoped-vmem limit — round 3 budgeted only the one-hot
    # and OOM'd at (n=2048, c=131) in PointCNN partseg's backward.
    # Mosaic: a block's last-two dims must be (mult of 8, mult of 128)
    # or equal the array dims — mt is the sublane dim of the idx block,
    # so it must be a multiple of 8 (or the whole m).
    row_budget = 1024 if n <= 2048 else max(256, (1 << 21) // n)
    cap = max(1, min(m, row_budget // max(k, 1)))
    while cap >= 8 and _footprint(cap, k, n, c) > _VMEM_BUDGET:
        cap -= 8
    for mt in range(cap - cap % 8, 0, -8):
        if m % mt == 0:
            return mt
    # no multiple-of-8 divisor <= cap (odd m etc.): signal the caller
    # to pad m rather than abandon the VMEM budget (mt=m would build a
    # [m*k, n] one-hot — hundreds of MB at production shapes)
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_neighbors(
    points: Array, idx: Array, interpret: bool = False
) -> Array:
    """Batched neighbor gather ``points[b, idx[b, m, k], :]``.

    Out-of-range indices (shadow sentinels >= N) yield zero rows — the
    mask convention used across the framework. Differentiable w.r.t.
    ``points`` (backward is the transposed selection matmul, i.e. the
    scatter-add XLA would otherwise emit as a slow scatter).
    """
    return _gather_fwd_impl(points, idx, interpret)


def _row_pad_plan(m: int, k: int, n: int, c: int):
    """(mt, pad): tile size and the row padding that makes it valid.
    Padding rows carry the sentinel index (>= n -> all-zero one-hot
    rows) so they gather/scatter exact zeros and are sliced away.
    (0, 0) means the kernel cannot fit scoped VMEM even at mt=8 —
    callers must take the XLA route."""
    if _footprint(8, k, n, c) > _VMEM_BUDGET:
        return 0, 0
    mt = _tile_m(m, k, n, c)
    if mt:
        return mt, 0
    pad = (-m) % 8
    mt = _tile_m(m + pad, k, n, c) or 8
    return mt, pad


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_fwd_impl(points, idx, interpret=False):
    b, n, c = points.shape
    _, m, k = idx.shape
    mt, pad = _row_pad_plan(m, k, n, c)
    if not mt:
        # kernel can't fit scoped VMEM at this (n, c) even at mt=8:
        # XLA row gather, zero-filling the sentinel rows (>= n) per
        # the documented contract.
        return jnp.take_along_axis(
            points, idx.reshape(b, -1, 1), axis=1,
            mode="fill", fill_value=0.0,
        ).reshape(b, m, k, c).astype(jnp.float32)
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)),
                      constant_values=n)
        m += pad
    grid = (b, m // mt)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, mt, k, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, k, c), jnp.float32),
        interpret=interpret,
    )(points.astype(jnp.float32), idx.astype(jnp.int32))
    return out[:, :m - pad] if pad else out


def _scatter_xla(g, idx, n):
    """XLA scatter-add fallback: ``out[b, idx[b,m,k], :] += g[b,m,k,:]``.
    ``mode="drop"`` makes sentinel indices (>= n) contribute nothing —
    the same zero-row convention as the kernel."""
    b, m, k, c = g.shape
    out = jnp.zeros((b, n, c), jnp.float32)
    return out.at[
        jnp.arange(b)[:, None], idx.reshape(b, m * k)
    ].add(g.reshape(b, m * k, c).astype(jnp.float32), mode="drop")


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def scatter_rows(g, idx, n, interpret=False):
    """Routed transposed-gather (scatter-add): the Pallas
    scatter-as-matmul kernel when its full VMEM footprint fits the
    scoped limit, else XLA's native scatter-add. This is the single
    backward entry point for gather_neighbors and knn_gather — round 3
    called the kernel unconditionally and OOM'd at (n=2048, c=131)
    in PointCNN partseg (f32[16,2048,8,131]).

    ``n % 128 != 0`` also routes to XLA: the kernel's one-hot build
    reshapes with n on the lane dim (Mosaic "unsupported shape cast"
    at n=36 — pointconv partseg's coarse decoder levels, the first
    unaligned-n caller, round 5), and at such small n the scatter
    matmul has nothing to win anyway."""
    b, m, k, c = g.shape
    mt, _ = _row_pad_plan(m, k, n, c)
    if not mt or n % 128:
        return _scatter_xla(g, idx, n)
    return _gather_bwd_impl(g, idx, n, interpret)


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _gather_bwd_impl(g, idx, n, interpret=False):
    b, m, k, c = g.shape
    mt, pad = _row_pad_plan(m, k, n, c)
    if not mt:
        return _scatter_xla(g, idx, n)
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)),
                      constant_values=n)
        m += pad
    grid = (b, m // mt)
    return pl.pallas_call(
        _scatter_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, mt, k, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(g.astype(jnp.float32), idx.astype(jnp.int32))


def _gather_vjp_fwd(points, idx, interpret):
    return _gather_fwd_impl(points, idx, interpret), (idx, points.shape[1])


def _gather_vjp_bwd(interpret, res, g):
    idx, n = res
    return scatter_rows(g, idx, n, interpret), None


gather_neighbors.defvjp(_gather_vjp_fwd, _gather_vjp_bwd)
