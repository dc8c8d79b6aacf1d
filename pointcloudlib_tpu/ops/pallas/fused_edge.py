"""Fused DGCNN EdgeConv (Pallas TPU).

One EdgeConv is ``concat(x_j − x_i, x_i) · W → BN → LeakyReLU →
max over k`` (reference networks/cls/dgcnn.py:29-50 + the conv blocks).
Same fusion as the SA MLP (ops/pallas/fused_sa.py) with a single layer:

    h[b,i,k] = x_j·Wa − x_i·Wa + x_i·Wb = Q[b, idx] − Off[b, i]
    with  Q = X·Wa,  Off = X·(Wa − Wb),  W = [Wa; Wb]

so the gather is the one-hot MXU matmul at output width, the edge
tensor ``[B,N,k,2C]`` never exists, and the ``[B,N,k,C']`` activation
never reaches HBM except as the bf16 h checkpoint. Because Q and Off
are computed in XLA, every parameter gradient flows through dQ/dOff by
ordinary AD — the custom VJP only produces dQ, dOff and the BN
dβ/dγ (which are the backward dstat sums). Forward: gather+stats pass,
then max pass; backward: ONE pass (the dstat sums and the scatter
pieces ``onehotᵀ·[dz ‖ x̂ ‖ 1]`` are affine in the unknown sums and
assembled in XLA — see fused_sa.py's derivation).

LeakyReLU(slope) replaces ReLU: max-pool backward splits ties of the
leaky output evenly (matching jnp.max) and scales by slope where z ≤ 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from pointcloudlib_tpu.ops.pallas.prec import pin_default_matmul_precision

from pointcloudlib_tpu.ops.pallas.fused_sa import (
    _flat,
    _gchunk,
    _m_tile,
    _moments,
    _ps_spec,
    _psum,
    _psum_init,
    _st_spec,
    _stack_stats,
    _zeros2,
)

Array = jax.Array


class EdgeStats(NamedTuple):
    mean: Array
    var: Array


def _bn_leaky(h2d, st_ref, slope, with_z=False):
    sc = st_ref[0, 0:1, :]
    bi = st_ref[0, 1:2, :]
    z = h2d * sc + bi
    y = jnp.where(z > 0, z, slope * z)
    return (y, z) if with_z else y


def _xhat_e(h2d, st_ref):
    return h2d * st_ref[0, 2:3, :] - st_ref[0, 3:4, :]


# ---------------------------------------------------------------- kernels


@pin_default_matmul_precision
def _ke_f1(q_ref, idx_ref, off_ref, h_ref, psum_ref, *, cm: int):
    """h = Q[idx] − Off (bf16 checkpoint) + Σ/Σ² for the BN stats."""
    n, c = q_ref.shape[1], q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    _psum_init(psum_ref)
    lane = lax.broadcasted_iota(jnp.int32, (cm, k, n), 2)

    def body(i, acc):
        idx = idx_ref[0, pl.ds(i * cm, cm), :]
        off = off_ref[0, pl.ds(i * cm, cm), :]
        onehot = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        g = jnp.dot(onehot.reshape(cm * k, n), q_ref[0],
                    preferred_element_type=jnp.float32)
        h = g.reshape(cm, k, c) - off[:, None, :]
        h_ref[0, pl.ds(i * cm, cm), :, :] = h.astype(jnp.bfloat16)
        flat = h.reshape(cm * k, c)
        return (acc[0] + jnp.sum(flat, axis=0, keepdims=True),
                acc[1] + jnp.sum(flat * flat, axis=0, keepdims=True))

    s, ss = lax.fori_loop(0, mt // cm, body, _zeros2(c))
    psum_ref[0] += jnp.concatenate([s, ss], axis=0)


@pin_default_matmul_precision
def _ke_out(h_ref, st_ref, out_ref, *, cm: int, slope: float):
    mt, k, c = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]

    def body(i, _):
        h = h_ref[0, pl.ds(i * cm, cm), :, :]
        h = h.astype(jnp.float32).reshape(cm * k, c)
        y = _bn_leaky(h, st_ref, slope)
        out_ref[0, pl.ds(i * cm, cm), :] = jnp.max(
            y.reshape(cm, k, c), axis=1)
        return 0

    lax.fori_loop(0, mt // cm, body, 0)


@pin_default_matmul_precision
def _ke_eval(q_ref, idx_ref, off_ref, st_ref, out_ref, *, cm: int,
             slope: float):
    n, c = q_ref.shape[1], q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    lane = lax.broadcasted_iota(jnp.int32, (cm, k, n), 2)

    def body(i, _):
        idx = idx_ref[0, pl.ds(i * cm, cm), :]
        off = off_ref[0, pl.ds(i * cm, cm), :]
        onehot = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        g = jnp.dot(onehot.reshape(cm * k, n), q_ref[0],
                    preferred_element_type=jnp.float32)
        h = (g.reshape(cm, k, c) - off[:, None, :]).reshape(cm * k, c)
        y = _bn_leaky(h, st_ref, slope)
        out_ref[0, pl.ds(i * cm, cm), :] = jnp.max(
            y.reshape(cm, k, c), axis=1)
        return 0

    lax.fori_loop(0, mt // cm, body, 0)


@pin_default_matmul_precision
def _ke_bwd(h_ref, dout_ref, idx_ref, st_ref, ps_ref, scat_ref,
            d1_ref, d2_ref, *, cm: int, slope: float):
    """Single backward pass: dz per row (max-pool even tie split +
    leaky mask), Σdz / Σdz·x̂ (= dβ/dγ), scatter pieces, per-center
    sums."""
    mt, k, c = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    n = scat_ref.shape[1]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        ps_ref[0] = jnp.zeros_like(ps_ref[0])

    @pl.when(pl.program_id(1) == 0)
    def _():
        scat_ref[0] = jnp.zeros_like(scat_ref[0])

    contract = (((0,), (0,)), ((), ()))
    lane = lax.broadcasted_iota(jnp.int32, (cm, k, n), 2)
    ones8 = jnp.ones((cm * k, 8), jnp.bfloat16)

    def body(i, acc):
        s, ss = acc
        h = h_ref[0, pl.ds(i * cm, cm), :, :]
        h = h.astype(jnp.float32).reshape(cm * k, c)
        dout = dout_ref[0, pl.ds(i * cm, cm), :]
        idx = idx_ref[0, pl.ds(i * cm, cm), :]
        y, z = _bn_leaky(h, st_ref, slope, with_z=True)
        a = y.reshape(cm, k, c)
        amax = jnp.max(a, axis=1, keepdims=True)
        ties = (a == amax).astype(jnp.float32)
        da = dout[:, None, :] * ties / jnp.sum(ties, axis=1,
                                               keepdims=True)
        da = da.reshape(cm * k, c)
        dz = jnp.where(z > 0, da, slope * da)
        xh = _xhat_e(h, st_ref)

        d1_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
            dz.reshape(cm, k, c), axis=1)
        d2_ref[0, pl.ds(i * cm, cm), :] = jnp.sum(
            xh.reshape(cm, k, c), axis=1)
        onehot = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        onehot = onehot.reshape(cm * k, n)
        right = jnp.concatenate(
            [dz.astype(jnp.bfloat16), xh.astype(jnp.bfloat16), ones8],
            axis=1)
        scat_ref[0] += lax.dot_general(
            onehot, right, contract, preferred_element_type=jnp.float32)
        return (s + jnp.sum(dz, axis=0, keepdims=True),
                ss + jnp.sum(dz * xh, axis=0, keepdims=True))

    s, ss = lax.fori_loop(0, mt // cm, body, _zeros2(c))
    ps_ref[0] += jnp.concatenate([s, ss], axis=0)


@pin_default_matmul_precision
def _ke_knn_f1(x_ref, q_ref, off_ref, idx_ref, h_ref, psum_ref,
               *, k: int, nt: int):
    """Fused kNN + gather: the argmin round's selection mask
    ``lane == best`` IS the one-hot gather row, so the separate gather
    kernel's one-hot build (rows·k·N compares) disappears — each round
    masks d2 AND multiplies Q in one go. Emits the neighbor indices
    (for the backward scatter), the h = Q[idx] − Off bf16 checkpoint,
    and the BN Σ/Σ² sums. Runs on a FLAT grid (b·nt,) so _psum_init
    zeroes the accumulator exactly once (program_id(0)==0), never per
    batch-0 tile.

    A bisection-top-k selection variant (batched chunk extraction,
    ~2× fewer VPU passes in theory) was built, compile-validated and
    A/B'd on chip in round 3 — it LOST at every production shape
    (0.71× at k=20 n=1024, 0.75× at k=40 n=2048: the rank matmuls and
    extra masks outweigh the saved argmin rounds) and was removed;
    see docs/DESIGN.md and scripts/bench_bisect_knn.py history."""
    n, c = q_ref.shape[1], q_ref.shape[2]
    mt = off_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)
    kcol = lax.broadcasted_iota(jnp.int32, (mt, k), 1)
    _psum_init(psum_ref)

    x = x_ref[0]
    start = pl.multiple_of((pl.program_id(0) % nt) * mt, 8)
    xq = x_ref[0, pl.ds(start, mt), :]
    x2 = jnp.sum(xq * xq, axis=1, keepdims=True)
    p2 = jnp.sum(x * x, axis=1, keepdims=True)
    inner = lax.dot_general(xq, x, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d2 = jnp.maximum(x2 - 2.0 * inner + p2.T, 0.0)
    off = off_ref[0]

    def body(j, carry):
        d2cur, idx_out, s, ss = carry
        best = jnp.argmin(d2cur, axis=1).astype(jnp.int32)     # [Mt]
        ind = lane == best[:, None]
        onehot = ind.astype(jnp.bfloat16)                      # free
        g = jnp.dot(onehot, q_ref[0],
                    preferred_element_type=jnp.float32)        # [Mt,C]
        h = g - off
        # h rides in [k, mt, c] layout: the round index j then lands on
        # an OUTER (untiled) dim, where dynamic stores are legal
        h_ref[0, pl.ds(j, 1), :, :] = h[None].astype(jnp.bfloat16)
        idx_out = jnp.where(kcol == j, best[:, None], idx_out)
        d2cur = jnp.where(ind, jnp.inf, d2cur)
        return (d2cur, idx_out,
                s + jnp.sum(h, axis=0, keepdims=True),
                ss + jnp.sum(h * h, axis=0, keepdims=True))

    _, idx_out, s, ss = lax.fori_loop(
        0, k, body,
        (d2, jnp.zeros((mt, k), jnp.int32)) + _zeros2(c))
    idx_ref[0] = idx_out
    psum_ref[0] += jnp.concatenate([s, ss], axis=0)


@pin_default_matmul_precision
def _ke_knn_eval(x_ref, q_ref, off_ref, st_ref, out_ref, *, k: int,
                 slope: float):
    """Eval: kNN selection + gather + BN + LeakyReLU + running max —
    no h checkpoint at all."""
    n, c = q_ref.shape[1], q_ref.shape[2]
    mt = off_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)

    x = x_ref[0]
    start = pl.multiple_of(pl.program_id(1) * mt, 8)
    xq = x_ref[0, pl.ds(start, mt), :]
    x2 = jnp.sum(xq * xq, axis=1, keepdims=True)
    p2 = jnp.sum(x * x, axis=1, keepdims=True)
    inner = lax.dot_general(xq, x, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d2 = jnp.maximum(x2 - 2.0 * inner + p2.T, 0.0)
    off = off_ref[0]

    def body(j, carry):
        d2cur, macc = carry
        best = jnp.argmin(d2cur, axis=1).astype(jnp.int32)
        ind = lane == best[:, None]
        onehot = ind.astype(jnp.bfloat16)
        g = jnp.dot(onehot, q_ref[0],
                    preferred_element_type=jnp.float32)
        y = _bn_leaky(g - off, st_ref, slope)
        macc = jnp.maximum(macc, y)
        d2cur = jnp.where(ind, jnp.inf, d2cur)
        return d2cur, macc

    _, macc = lax.fori_loop(
        0, k, body, (d2, jnp.full((mt, c), -jnp.inf, jnp.float32)))
    out_ref[0] = macc


def fused_edge_eval_knn(x, q, off, gamma, beta, stats, k,
                        slope=0.2, interpret=False):
    """Eval-mode EdgeConv with in-kernel graph construction."""
    return _fused_edge_eval_knn_jit(
        x, q, off, gamma, beta, stats, k=k, slope=slope,
        interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("k", "slope", "interpret")
)
def _fused_edge_eval_knn_jit(x, q, off, gamma, beta, stats: EdgeStats,
                             k: int, slope: float = 0.2,
                             interpret: bool = False):
    b, n, cf = x.shape
    c = q.shape[2]
    st = _stack_stats(stats.mean, stats.var, gamma, beta)
    per_row = 2 * (c * 4 * 2) + n * 4
    budget = (5 << 20) - 4 * n * (cf + c)
    from pointcloudlib_tpu.ops.pallas.fused_sa import _block_tile

    mt = _block_tile(n, max(8, budget // per_row))
    return pl.pallas_call(
        functools.partial(_ke_knn_eval, k=k, slope=slope),
        grid=(b, n // mt),
        in_specs=[
            pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, mt, c), lambda i, j: (i, j, 0)),
            _st_spec(c),
        ],
        out_specs=pl.BlockSpec((1, mt, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), q.astype(jnp.bfloat16),
      off.astype(jnp.float32), st)


def _call_eknn_f1(x, q, off, k, interpret):
    """Fused self-kNN + gather + stats (forward of fused_edge_knn)."""
    b, n, cf = x.shape
    c = q.shape[2]
    # per-row blocks: h [k,c] bf16 + idx [k] i32 + off [c] f32, double
    # buffered; d2 [mt, n] f32 is a live temporary; x/q stay resident
    per_row = 2 * (k * c * 2 + k * 4 + c * 4) + n * 4
    budget = (5 << 20) - 4 * n * (cf + c)
    from pointcloudlib_tpu.ops.pallas.fused_sa import _block_tile

    mt = _block_tile(n, max(8, budget // per_row))
    nt = n // mt
    idx, h, psum = pl.pallas_call(
        functools.partial(_ke_knn_f1, k=k, nt=nt),
        # flat grid: _psum_init zeroes at program_id(0)==0 exactly once
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec((1, n, cf), lambda i: (i // nt, 0, 0)),
            pl.BlockSpec((1, n, c), lambda i: (i // nt, 0, 0)),
            pl.BlockSpec((1, mt, c), lambda i: (i // nt, i % nt, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, mt, k), lambda i: (i // nt, i % nt, 0)),
            pl.BlockSpec((1, k, mt, c),
                         lambda i: (i // nt, 0, i % nt, 0)),
            _ps_spec(c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, k), jnp.int32),
            jax.ShapeDtypeStruct((b, k, n, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, 2, c), jnp.float32),
        ],
        interpret=interpret,
    )(x.astype(jnp.float32), q.astype(jnp.bfloat16),
      off.astype(jnp.float32))
    # downstream passes read [b, n, k, c]
    return idx, jnp.swapaxes(h, 1, 2), psum


# ---------------------------------------------------------- orchestration


def _call_ef1(q, idx, off, interpret):
    b, n, c = q.shape
    _, m, k = idx.shape
    mt = _m_tile(m, k, bf16_widths=c)
    cm = _gchunk(mt, k, n)
    h, psum = pl.pallas_call(
        functools.partial(_ke_f1, cm=cm),
        grid=(b * (m // mt),),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, _m=m, _mt=mt:
                         (i // (_m // _mt), 0, 0)),
            _flat(m, mt, (k,)),
            _flat(m, mt, (c,)),
        ],
        out_specs=[_flat(m, mt, (k, c)), _ps_spec(c)],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, k, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, 2, c), jnp.float32),
        ],
        interpret=interpret,
    )(q.astype(jnp.bfloat16), idx.astype(jnp.int32),
      off.astype(jnp.float32))
    return h, psum


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_edge_conv(q, off, idx, gamma, beta, slope=0.2,
                    interpret=False, axis_name=None, world=1):
    """Fused EdgeConv: ``max_k leakyrelu(BN(Q[idx] − Off))``.

    ``q = X·Wa``, ``off = X·(Wa − Wb)`` computed in XLA (their AD
    carries all W/X gradients); returns ``(out [B,N,C'],
    EdgeStats(mean, var))`` with batch statistics over every edge row,
    psum'd over ``axis_name`` under shard_map DP.
    """
    out, stats, _ = _edge_fwd(q, off, idx, gamma, beta, slope,
                              interpret, axis_name, world)
    return out, stats


def _edge_fwd(q, off, idx, gamma, beta, slope, interpret, axis_name,
              world):
    b = q.shape[0]
    _, m, k = idx.shape
    r = float(b * m * k * world)
    h, ps = _call_ef1(q, idx, off, interpret)
    mean, var = _moments(_psum(ps[0], axis_name), r)
    st = _stack_stats(mean, var, gamma, beta)
    out = _call_eout(h, st, slope, interpret)
    return out, EdgeStats(mean, var), (h, st)


def _call_eout(h, st, slope, interpret):
    b, m, k, c = h.shape
    mt = _m_tile(m, k, bf16_widths=c)
    cm = max(1, min(mt, 1024 // k))
    while mt % cm:
        cm -= 1
    return pl.pallas_call(
        functools.partial(_ke_out, cm=cm, slope=slope),
        grid=(b * (m // mt),),
        in_specs=[_flat(m, mt, (k, c)), _st_spec(c)],
        out_specs=_flat(m, mt, (c,)),
        out_shape=jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        interpret=interpret,
    )(h, st)


def _edge_fwd_rule(q, off, idx, gamma, beta, slope, interpret,
                   axis_name, world):
    out, stats, (h, st) = _edge_fwd(q, off, idx, gamma, beta, slope,
                                    interpret, axis_name, world)
    return (out, stats), (idx, h, st, q.shape[1])


def _edge_bwd_rule(slope, interpret, axis_name, world, res, cts):
    (dout, _dstats) = cts
    idx, h, st, n = res
    b, m, k, c = h.shape
    r = float(b * m * k * world)

    mt = _m_tile(m, k, bf16_widths=c, f32_widths=c // k + 1,
                 fixed_bytes=8 * n * (2 * c + 8))
    cm = _gchunk(mt, k, n)
    ps, scat, d1, d2 = pl.pallas_call(
        functools.partial(_ke_bwd, cm=cm, slope=slope),
        grid=(b, m // mt),
        in_specs=[
            pl.BlockSpec((1, mt, k, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, mt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0)),
            _st_spec(c),
        ],
        out_specs=[
            _ps_spec(c),
            pl.BlockSpec((1, n, 2 * c + 8), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, mt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, mt, c), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 2, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 2 * c + 8), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        ],
        interpret=interpret,
    )(h, dout, idx.astype(jnp.int32), st)

    ps_g = _psum(ps, axis_name)
    sc = st[0, 0]
    u1 = ps_g[0, 0] / r
    u2 = ps_g[0, 1] / r
    scdz = scat[:, :, :c]
    scxh = scat[:, :, c:2 * c]
    cnt = scat[:, :, 2 * c:2 * c + 1]
    dq = sc * (scdz - cnt * u1[None, None, :] - scxh * u2[None, None, :])
    doff = -sc * (d1 - float(k) * u1[None, None, :]
                  - d2 * u2[None, None, :])
    # dβ/dγ: this shard's partial dstat sums
    return dq, doff, None, ps[0, 1], ps[0, 0]


fused_edge_conv.defvjp(_edge_fwd_rule, _edge_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_edge_conv_knn(x, q, off, gamma, beta, k, slope=0.2,
                        interpret=False, axis_name=None, world=1):
    """EdgeConv with the self-kNN graph built INSIDE the gather kernel
    (_ke_knn_f1): each argmin round's selection mask doubles as the
    one-hot gather row, eliminating the separate kNN kernel and the
    gather's one-hot build. Graph construction carries no gradient
    (matching the reference and the unfused path)."""
    out, stats, _ = _edge_knn_fwd(x, q, off, gamma, beta, k, slope,
                                  interpret, axis_name, world)
    return out, stats


def _edge_knn_fwd(x, q, off, gamma, beta, k, slope, interpret,
                  axis_name, world):
    b, n, _ = x.shape
    r = float(b * n * k * world)
    idx, h, ps = _call_eknn_f1(lax.stop_gradient(x), q, off, k,
                               interpret)
    mean, var = _moments(_psum(ps[0], axis_name), r)
    st = _stack_stats(mean, var, gamma, beta)
    out = _call_eout(h, st, slope, interpret)
    return out, EdgeStats(mean, var), (idx, h, st)


def _edge_knn_fwd_rule(x, q, off, gamma, beta, k, slope, interpret,
                       axis_name, world):
    out, stats, (idx, h, st) = _edge_knn_fwd(
        x, q, off, gamma, beta, k, slope, interpret, axis_name, world)
    return (out, stats), (idx, h, st, q.shape[1])


def _edge_knn_bwd_rule(k, slope, interpret, axis_name, world, res,
                       cts):
    dq, doff, _, dg, db = _edge_bwd_rule(slope, interpret, axis_name,
                                         world, res, cts)
    return None, dq, doff, dg, db


fused_edge_conv_knn.defvjp(_edge_knn_fwd_rule, _edge_knn_bwd_rule)


def fused_edge_eval(q, off, idx, gamma, beta, stats: EdgeStats,
                    slope=0.2, interpret=False):
    """Eval-mode fused EdgeConv with running statistics."""
    b, n, c = q.shape
    _, m, k = idx.shape
    st = _stack_stats(stats.mean, stats.var, gamma, beta)
    mt = _m_tile(m, k, bf16_widths=c)
    cm = _gchunk(mt, k, n)
    return pl.pallas_call(
        functools.partial(_ke_eval, cm=cm, slope=slope),
        grid=(b * (m // mt),),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, _m=m, _mt=mt:
                         (i // (_m // _mt), 0, 0)),
            _flat(m, mt, (k,)),
            _flat(m, mt, (c,)),
            _st_spec(c),
        ],
        out_specs=_flat(m, mt, (c,)),
        out_shape=jax.ShapeDtypeStruct((b, m, c), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), idx.astype(jnp.int32),
      off.astype(jnp.float32), st)


# ------------------------------------------------ two-layer variant
#
# DGCNN partseg's EdgeConv pairs (networks/seg/dgcnn_partseg.py:35-128)
# run TWO Dense+BN+LeakyReLU layers on the edge features before the
# max. Same machinery with one more level: forward F1 → stats2 → out;
# backward P1 (S2 sums + the affine-in-sums accumulators, reusing
# fused_sa._combine_p1 which is level-generic) → P2 (dh1 per row with
# the now-known sums, hi/lo scatter).

from pointcloudlib_tpu.ops.pallas.fused_sa import (  # noqa: E402
    _combine_p1,
    _divisor_tile,
    _w_spec,
)


def _leaky_mask(z, slope):
    return jnp.where(z > 0, 1.0, slope)


@pin_default_matmul_precision
def _ke2_stats2(h_ref, st1_ref, w2_ref, psum_ref, *, cm: int,
                slope: float):
    """Σ/Σ² of h2 = leaky(BN1(h1))·W2."""
    mt, k, c1 = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    c2 = w2_ref.shape[1]
    _psum_init(psum_ref)

    def body(i, acc):
        h1 = h_ref[0, pl.ds(i * cm, cm), :, :]
        h1 = h1.astype(jnp.float32).reshape(cm * k, c1)
        y1 = _bn_leaky(h1, st1_ref, slope)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        return (acc[0] + jnp.sum(h2, axis=0, keepdims=True),
                acc[1] + jnp.sum(h2 * h2, axis=0, keepdims=True))

    s, ss = lax.fori_loop(0, mt // cm, body, _zeros2(c2))
    psum_ref[0] += jnp.concatenate([s, ss], axis=0)


@pin_default_matmul_precision
def _ke2_out(h_ref, st1_ref, st2_ref, w2_ref, out_ref, *, cm: int,
             slope: float):
    mt, k, c1 = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    c2 = w2_ref.shape[1]

    def body(i, _):
        h1 = h_ref[0, pl.ds(i * cm, cm), :, :]
        h1 = h1.astype(jnp.float32).reshape(cm * k, c1)
        y1 = _bn_leaky(h1, st1_ref, slope)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        y2 = _bn_leaky(h2, st2_ref, slope)
        out_ref[0, pl.ds(i * cm, cm), :] = jnp.max(
            y2.reshape(cm, k, c2), axis=1)
        return 0

    lax.fori_loop(0, mt // cm, body, 0)


@pin_default_matmul_precision
def _ke2_p1(h_ref, dout_ref, st1_ref, st2_ref, w2_ref,
            ps2_ref, vec_ref, mats_ref, *, cm: int, slope: float):
    """Backward pass 1: S2 sums + [y1|m1|m1·x̂1]ᵀ·[dz2|x̂2]."""
    mt, k, c1 = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    c2 = w2_ref.shape[1]
    _psum_init(ps2_ref)

    @pl.when(pl.program_id(0) == 0)
    def _():
        vec_ref[0] = jnp.zeros_like(vec_ref[0])
        mats_ref[0] = jnp.zeros_like(mats_ref[0])

    contract = (((0,), (0,)), ((), ()))

    def body(i, acc):
        s, ss, vecs, mats = acc
        h1 = h_ref[0, pl.ds(i * cm, cm), :, :]
        h1 = h1.astype(jnp.float32).reshape(cm * k, c1)
        dout = dout_ref[0, pl.ds(i * cm, cm), :]
        y1, z1 = _bn_leaky(h1, st1_ref, slope, with_z=True)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        # dz2: max-pool even tie split + leaky mask at level 2
        y2, z2 = _bn_leaky(h2, st2_ref, slope, with_z=True)
        a = y2.reshape(cm, k, c2)
        amax = jnp.max(a, axis=1, keepdims=True)
        ties = (a == amax).astype(jnp.float32)
        da = dout[:, None, :] * ties / jnp.sum(ties, axis=1,
                                               keepdims=True)
        dz2 = (_leaky_mask(z2, slope)
               * da.reshape(cm * k, c2))
        xh2 = _xhat_e(h2, st2_ref)
        m1 = _leaky_mask(z1, slope)
        xh1 = _xhat_e(h1, st1_ref)
        left = jnp.concatenate([y1, m1, m1 * xh1], axis=1)
        right = jnp.concatenate([dz2, xh2], axis=1)
        mats = mats + lax.dot_general(
            left.astype(jnp.bfloat16), right.astype(jnp.bfloat16),
            contract, preferred_element_type=jnp.float32)
        return (s + jnp.sum(dz2, axis=0, keepdims=True),
                ss + jnp.sum(dz2 * xh2, axis=0, keepdims=True),
                vecs + jnp.sum(left, axis=0, keepdims=True),
                mats)

    s, ss, vecs, mats = lax.fori_loop(
        0, mt // cm, body,
        _zeros2(c2) + (jnp.zeros((1, 3 * c1), jnp.float32),
                       jnp.zeros((3 * c1, 2 * c2), jnp.float32)))
    ps2_ref[0] += jnp.concatenate([s, ss], axis=0)
    vec_ref[0] += vecs
    mats_ref[0] += mats


@pin_default_matmul_precision
def _ke2_p2(h_ref, dout_ref, idx_ref, st1_ref, st2_ref, w2_ref,
            wt2_ref, us2_ref, us1_ref, dq_ref, doff_ref,
            *, cm: int, slope: float):
    """Backward pass 2: dh1 per row (all sums known) → hi/lo scatter."""
    mt, k, c1 = h_ref.shape[1], h_ref.shape[2], h_ref.shape[3]
    c2 = w2_ref.shape[1]
    n = dq_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    contract = (((0,), (0,)), ((), ()))
    lane = lax.broadcasted_iota(jnp.int32, (cm, k, n), 2)

    def body(i, _):
        h1 = h_ref[0, pl.ds(i * cm, cm), :, :]
        h1 = h1.astype(jnp.float32).reshape(cm * k, c1)
        dout = dout_ref[0, pl.ds(i * cm, cm), :]
        idx = idx_ref[0, pl.ds(i * cm, cm), :]
        y1, z1 = _bn_leaky(h1, st1_ref, slope, with_z=True)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        y2, z2 = _bn_leaky(h2, st2_ref, slope, with_z=True)
        a = y2.reshape(cm, k, c2)
        amax = jnp.max(a, axis=1, keepdims=True)
        ties = (a == amax).astype(jnp.float32)
        da = dout[:, None, :] * ties / jnp.sum(ties, axis=1,
                                               keepdims=True)
        dz2 = _leaky_mask(z2, slope) * da.reshape(cm * k, c2)
        # dh2 = sc2·(dz2 − u1 − x̂2·u2) with pre-divided sums
        sc2 = st2_ref[0, 0:1, :]
        dh2 = sc2 * (dz2 - us2_ref[0, 0:1, :]
                     - _xhat_e(h2, st2_ref) * us2_ref[0, 1:2, :])
        dy1 = jnp.dot(dh2.astype(jnp.bfloat16), wt2_ref[:, :],
                      preferred_element_type=jnp.float32)
        dz1 = _leaky_mask(z1, slope) * dy1
        sc1 = st1_ref[0, 0:1, :]
        dh1 = sc1 * (dz1 - us1_ref[0, 0:1, :]
                     - _xhat_e(h1, st1_ref) * us1_ref[0, 1:2, :])

        doff_ref[0, pl.ds(i * cm, cm), :] = -jnp.sum(
            dh1.reshape(cm, k, c1), axis=1)
        onehot = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        onehot = onehot.reshape(cm * k, n)
        hi = dh1.astype(jnp.bfloat16)
        lo = (dh1 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = lax.dot_general(onehot, hi, contract,
                              preferred_element_type=jnp.float32)
        acc += lax.dot_general(onehot, lo, contract,
                               preferred_element_type=jnp.float32)
        dq_ref[0] += acc
        return 0

    lax.fori_loop(0, mt // cm, body, 0)


class Edge2Stats(NamedTuple):
    m1: Array
    v1: Array
    m2: Array
    v2: Array


def _e2_fwd(q, off, idx, w2, g1, b1, g2, b2, slope, interpret,
            axis_name, world):
    b = q.shape[0]
    _, m, k = idx.shape
    r = float(b * m * k * world)
    h1, ps = _call_ef1(q, idx, off, interpret)
    m1, v1 = _moments(_psum(ps[0], axis_name), r)
    st1 = _stack_stats(m1, v1, g1, b1)

    b_, mm, kk, c1 = h1.shape
    c2 = w2.shape[1]
    mt = _m_tile(mm, kk, bf16_widths=c1)
    cm = _divisor_tile(mt, max(1, 1024 // kk))
    ps2 = pl.pallas_call(
        functools.partial(_ke2_stats2, cm=cm, slope=slope),
        grid=(b_ * (mm // mt),),
        in_specs=[_flat(mm, mt, (kk, c1)), _st_spec(c1), _w_spec(w2)],
        out_specs=_ps_spec(c2),
        out_shape=jax.ShapeDtypeStruct((1, 2, c2), jnp.float32),
        interpret=interpret,
    )(h1, st1, w2.astype(jnp.bfloat16))
    m2, v2 = _moments(_psum(ps2[0], axis_name), r)
    st2 = _stack_stats(m2, v2, g2, b2)

    out = pl.pallas_call(
        functools.partial(_ke2_out, cm=cm, slope=slope),
        grid=(b_ * (mm // mt),),
        in_specs=[_flat(mm, mt, (kk, c1)), _st_spec(c1), _st_spec(c2),
                  _w_spec(w2)],
        out_specs=_flat(mm, mt, (c2,)),
        out_shape=jax.ShapeDtypeStruct((b_, mm, c2), jnp.float32),
        interpret=interpret,
    )(h1, st1, st2, w2.astype(jnp.bfloat16))
    return out, Edge2Stats(m1, v1, m2, v2), (h1, st1, st2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_edge2_conv(q, off, idx, w2, g1, b1, g2, b2, slope=0.2,
                     interpret=False, axis_name=None, world=1):
    """Two-layer fused EdgeConv:
    ``max_k leaky(BN2(leaky(BN1(Q[idx] − Off))·W2))`` — the DGCNN
    partseg pair. W1 lives in Q/Off (XLA AD); W2 is in-kernel with its
    gradient from the affine-in-sums expansion."""
    out, stats, _ = _e2_fwd(q, off, idx, w2, g1, b1, g2, b2, slope,
                            interpret, axis_name, world)
    return out, stats


def _e2_fwd_rule(q, off, idx, w2, g1, b1, g2, b2, slope, interpret,
                 axis_name, world):
    out, stats, (h1, st1, st2) = _e2_fwd(
        q, off, idx, w2, g1, b1, g2, b2, slope, interpret, axis_name,
        world)
    return (out, stats), (idx, h1, st1, st2, w2, q.shape[1])


def _e2_bwd_rule(slope, interpret, axis_name, world, res, cts):
    (dout, _dstats) = cts
    idx, h1, st1, st2, w2, n = res
    b, m, k, c1 = h1.shape
    c2 = w2.shape[1]
    r = float(b * m * k * world)

    mt = _m_tile(m, k, bf16_widths=c1, f32_widths=c2 // k + 1)
    cm = _divisor_tile(mt, max(1, 1024 // k))
    ps2, vecs, mats = pl.pallas_call(
        functools.partial(_ke2_p1, cm=cm, slope=slope),
        grid=(b * (m // mt),),
        in_specs=[_flat(m, mt, (k, c1)), _flat(m, mt, (c2,)),
                  _st_spec(c1), _st_spec(c2), _w_spec(w2)],
        out_specs=[_ps_spec(c2),
                   pl.BlockSpec((1, 1, 3 * c1), lambda *a: (0, 0, 0)),
                   pl.BlockSpec((1, 3 * c1, 2 * c2),
                                lambda *a: (0, 0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((1, 2, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 3 * c1), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c1, 2 * c2), jnp.float32),
        ],
        interpret=interpret,
    )(h1, dout, st1, st2, w2.astype(jnp.bfloat16))

    # _combine_p1 is level-generic: dW2 from this shard's accumulators
    # with global u-terms; s1 (the BN1 sums) global under axis_name
    dw2, s1, ps2_g = _combine_p1(ps2, vecs, mats, st2, w2, r, axis_name)
    if axis_name is not None:
        # local partial S1 for the dγ1/dβ1 grads (same as fused_sa)
        sc2 = st2[0, 0]
        w2s = w2 * sc2[None, :]
        ps2g = _psum(ps2, axis_name)
        u1 = ps2g[0, 0] / r
        u2 = ps2g[0, 1] / r
        vm = vecs[0, 0, c1:2 * c1]
        vmx = vecs[0, 0, 2 * c1:]
        E, G = mats[0, c1:2 * c1, :c2], mats[0, c1:2 * c1, c2:]
        Ep, Gp = mats[0, 2 * c1:, :c2], mats[0, 2 * c1:, c2:]
        s1_l1 = jnp.sum((E - G * u2[None, :]) * w2s, axis=1) \
            - vm * (w2s @ u1)
        s1_l2 = jnp.sum((Ep - Gp * u2[None, :]) * w2s, axis=1) \
            - vmx * (w2s @ u1)
        g1_grad, b1_grad = s1_l2, s1_l1
    else:
        g1_grad, b1_grad = s1[0, 1], s1[0, 0]

    us2 = ps2_g / r
    us1 = s1 / r  # s1 from _combine_p1 is already global under axis

    mt = _m_tile(m, k, bf16_widths=c1, f32_widths=c2 // k + 1,
                 fixed_bytes=8 * n * c1)
    cmg = _gchunk(mt, k, n)
    dq, doff = pl.pallas_call(
        functools.partial(_ke2_p2, cm=cmg, slope=slope),
        grid=(b, m // mt),
        in_specs=[
            pl.BlockSpec((1, mt, k, c1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, mt, c2), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, mt, k), lambda i, j: (i, j, 0)),
            _st_spec(c1), _st_spec(c2), _w_spec(w2),
            pl.BlockSpec((c2, c1), lambda i, j: (0, 0)),
            _ps_spec(c2), _ps_spec(c1),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, mt, c1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((b, m, c1), jnp.float32),
        ],
        interpret=interpret,
    )(h1, dout, idx.astype(jnp.int32), st1, st2,
      w2.astype(jnp.bfloat16),
      jnp.swapaxes(w2, 0, 1).astype(jnp.bfloat16), us2, us1)

    # dγ2/dβ2 are this shard's partial S2 sums
    return (dq, doff, None, dw2, g1_grad, b1_grad, ps2[0, 1], ps2[0, 0])


fused_edge2_conv.defvjp(_e2_fwd_rule, _e2_bwd_rule)


def fused_edge2_eval(q, off, idx, w2, g1, b1, g2, b2,
                     stats: Edge2Stats, slope=0.2, interpret=False):
    """Eval-mode two-layer fused EdgeConv with running statistics."""
    b, n, c1 = q.shape
    _, m, k = idx.shape
    c2 = w2.shape[1]
    st1 = _stack_stats(stats.m1, stats.v1, g1, b1)
    st2 = _stack_stats(stats.m2, stats.v2, g2, b2)
    mt = _m_tile(m, k, bf16_widths=c1)
    cm = _gchunk(mt, k, n)
    return pl.pallas_call(
        functools.partial(_ke2_eval, cm=cm, slope=slope),
        grid=(b * (m // mt),),
        in_specs=[
            pl.BlockSpec((1, n, c1), lambda i, _m=m, _mt=mt:
                         (i // (_m // _mt), 0, 0)),
            _flat(m, mt, (k,)),
            _flat(m, mt, (c1,)),
            _st_spec(c1), _st_spec(c2), _w_spec(w2),
        ],
        out_specs=_flat(m, mt, (c2,)),
        out_shape=jax.ShapeDtypeStruct((b, m, c2), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), idx.astype(jnp.int32),
      off.astype(jnp.float32), st1, st2, w2.astype(jnp.bfloat16))


@pin_default_matmul_precision
def _ke2_eval(q_ref, idx_ref, off_ref, st1_ref, st2_ref, w2_ref,
              out_ref, *, cm: int, slope: float):
    n, c1 = q_ref.shape[1], q_ref.shape[2]
    mt, k = idx_ref.shape[1], idx_ref.shape[2]
    c2 = w2_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (cm, k, n), 2)

    def body(i, _):
        idx = idx_ref[0, pl.ds(i * cm, cm), :]
        off = off_ref[0, pl.ds(i * cm, cm), :]
        onehot = (lane == idx[:, :, None]).astype(jnp.bfloat16)
        g = jnp.dot(onehot.reshape(cm * k, n), q_ref[0],
                    preferred_element_type=jnp.float32)
        h1 = (g.reshape(cm, k, c1) - off[:, None, :]).reshape(cm * k, c1)
        y1 = _bn_leaky(h1, st1_ref, slope)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        y2 = _bn_leaky(h2, st2_ref, slope)
        out_ref[0, pl.ds(i * cm, cm), :] = jnp.max(
            y2.reshape(cm, k, c2), axis=1)
        return 0

    lax.fori_loop(0, mt // cm, body, 0)


# -------------------------------------------- two-layer, in-kernel kNN


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_edge2_conv_knn(x, q, off, w2, g1, b1, g2, b2, k, slope=0.2,
                         interpret=False, axis_name=None, world=1):
    """Two-layer fused EdgeConv with the self-kNN graph built inside
    the gather kernel (see fused_edge_conv_knn)."""
    out, stats, _ = _e2_knn_fwd(x, q, off, w2, g1, b1, g2, b2, k,
                                slope, interpret, axis_name, world)
    return out, stats


def _e2_knn_fwd(x, q, off, w2, g1, b1, g2, b2, k, slope, interpret,
                axis_name, world):
    b, n, _ = x.shape
    r = float(b * n * k * world)
    idx, h1, ps = _call_eknn_f1(lax.stop_gradient(x), q, off, k,
                                interpret)
    m1, v1 = _moments(_psum(ps[0], axis_name), r)
    st1 = _stack_stats(m1, v1, g1, b1)

    b_, mm, kk, c1 = h1.shape
    c2 = w2.shape[1]
    mt = _m_tile(mm, kk, bf16_widths=c1)
    cm = _divisor_tile(mt, max(1, 1024 // kk))
    ps2 = pl.pallas_call(
        functools.partial(_ke2_stats2, cm=cm, slope=slope),
        grid=(b_ * (mm // mt),),
        in_specs=[_flat(mm, mt, (kk, c1)), _st_spec(c1), _w_spec(w2)],
        out_specs=_ps_spec(c2),
        out_shape=jax.ShapeDtypeStruct((1, 2, c2), jnp.float32),
        interpret=interpret,
    )(h1, st1, w2.astype(jnp.bfloat16))
    m2, v2 = _moments(_psum(ps2[0], axis_name), r)
    st2 = _stack_stats(m2, v2, g2, b2)

    out = pl.pallas_call(
        functools.partial(_ke2_out, cm=cm, slope=slope),
        grid=(b_ * (mm // mt),),
        in_specs=[_flat(mm, mt, (kk, c1)), _st_spec(c1), _st_spec(c2),
                  _w_spec(w2)],
        out_specs=_flat(mm, mt, (c2,)),
        out_shape=jax.ShapeDtypeStruct((b_, mm, c2), jnp.float32),
        interpret=interpret,
    )(h1, st1, st2, w2.astype(jnp.bfloat16))
    return out, Edge2Stats(m1, v1, m2, v2), (idx, h1, st1, st2)


def _e2_knn_fwd_rule(x, q, off, w2, g1, b1, g2, b2, k, slope,
                     interpret, axis_name, world):
    out, stats, (idx, h1, st1, st2) = _e2_knn_fwd(
        x, q, off, w2, g1, b1, g2, b2, k, slope, interpret, axis_name,
        world)
    return (out, stats), (idx, h1, st1, st2, w2, q.shape[1])


def _e2_knn_bwd_rule(k, slope, interpret, axis_name, world, res, cts):
    grads = _e2_bwd_rule(slope, interpret, axis_name, world, res, cts)
    # (dq, doff, None(idx), dw2, dg1, db1, dg2, db2) -> prepend dx=None
    dq, doff, _, dw2, dg1, db1, dg2, db2 = grads
    return None, dq, doff, dw2, dg1, db1, dg2, db2


fused_edge2_conv_knn.defvjp(_e2_knn_fwd_rule, _e2_knn_bwd_rule)


@pin_default_matmul_precision
def _ke2_knn_eval(x_ref, q_ref, off_ref, st1_ref, st2_ref, w2_ref,
                  out_ref, *, k: int, slope: float):
    """Two-layer eval with in-kernel kNN selection + running max."""
    n, c1 = q_ref.shape[1], q_ref.shape[2]
    mt = off_ref.shape[1]
    c2 = w2_ref.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, (mt, n), 1)

    x = x_ref[0]
    start = pl.multiple_of(pl.program_id(1) * mt, 8)
    xq = x_ref[0, pl.ds(start, mt), :]
    x2 = jnp.sum(xq * xq, axis=1, keepdims=True)
    p2 = jnp.sum(x * x, axis=1, keepdims=True)
    inner = lax.dot_general(xq, x, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d2 = jnp.maximum(x2 - 2.0 * inner + p2.T, 0.0)
    off = off_ref[0]

    def body(j, carry):
        d2cur, macc = carry
        best = jnp.argmin(d2cur, axis=1).astype(jnp.int32)
        ind = lane == best[:, None]
        onehot = ind.astype(jnp.bfloat16)
        g = jnp.dot(onehot, q_ref[0],
                    preferred_element_type=jnp.float32)
        y1 = _bn_leaky(g - off, st1_ref, slope)
        h2 = jnp.dot(y1.astype(jnp.bfloat16), w2_ref[:, :],
                     preferred_element_type=jnp.float32)
        y2 = _bn_leaky(h2, st2_ref, slope)
        macc = jnp.maximum(macc, y2)
        d2cur = jnp.where(ind, jnp.inf, d2cur)
        return d2cur, macc

    _, macc = lax.fori_loop(
        0, k, body, (d2, jnp.full((mt, c2), -jnp.inf, jnp.float32)))
    out_ref[0] = macc


def fused_edge2_eval_knn(x, q, off, w2, g1, b1, g2, b2, stats, k,
                         slope=0.2, interpret=False):
    """2-layer eval EdgeConv with in-kernel graph construction."""
    return _fused_edge2_eval_knn_jit(
        x, q, off, w2, g1, b1, g2, b2, stats, k=k, slope=slope,
        interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("k", "slope", "interpret")
)
def _fused_edge2_eval_knn_jit(x, q, off, w2, g1, b1, g2, b2,
                              stats: Edge2Stats, k: int,
                              slope: float = 0.2,
                              interpret: bool = False):
    b, n, cf = x.shape
    c1 = q.shape[2]
    c2 = w2.shape[1]
    st1 = _stack_stats(stats.m1, stats.v1, g1, b1)
    st2 = _stack_stats(stats.m2, stats.v2, g2, b2)
    per_row = 2 * ((c1 + c2) * 4 * 2) + n * 4
    budget = (5 << 20) - 4 * n * (cf + c1)
    from pointcloudlib_tpu.ops.pallas.fused_sa import _block_tile

    mt = _block_tile(n, max(8, budget // per_row))
    return pl.pallas_call(
        functools.partial(_ke2_knn_eval, k=k, slope=slope),
        grid=(b, n // mt),
        in_specs=[
            pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, c1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, mt, c1), lambda i, j: (i, j, 0)),
            _st_spec(c1), _st_spec(c2), _w_spec(w2),
        ],
        out_specs=pl.BlockSpec((1, mt, c2), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c2), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), q.astype(jnp.bfloat16),
      off.astype(jnp.float32), st1, st2, w2.astype(jnp.bfloat16))
