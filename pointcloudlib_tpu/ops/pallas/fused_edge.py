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
        s, ss, scat = acc
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
        scat = scat + lax.dot_general(
            onehot, right, contract, preferred_element_type=jnp.float32)
        return (s + jnp.sum(dz, axis=0, keepdims=True),
                ss + jnp.sum(dz * xh, axis=0, keepdims=True),
                scat)

    s, ss, scat = lax.fori_loop(
        0, mt // cm, body,
        _zeros2(c) + (jnp.zeros((n, 2 * c + 8), jnp.float32),))
    ps_ref[0] += jnp.concatenate([s, ss], axis=0)
    scat_ref[0] += scat


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

    mt = _m_tile(m, k, bf16_widths=c, f32_widths=c // k + 1)
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
