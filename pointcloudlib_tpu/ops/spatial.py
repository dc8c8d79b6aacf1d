"""Spatial canonicalization: Hilbert-curve ordering of point clouds.

Point clouds are unordered sets; the framework canonicalizes batch
order along a Hilbert space-filling curve so that **index locality
implies spatial locality**. The fused Pallas kernels exploit this: a
tile of spatially-clustered rows gathers from a narrow index *window*
of the source cloud instead of all N lanes (ops/pallas/fused_sa.py),
cutting the one-hot build and the gather/scatter matmuls by N/W.

Correctness never depends on the ordering — the windowed kernels
compute per-tile windows from the actual indices and fall back to a
full-width path for tiles that don't cluster — so canonicalization is
a pure performance hint, applied batch-wise by the trainer after
augmentation (train/trainer.py) and by the serving predictors
(inference.py, which un-sorts per-point outputs).

The reference has no analogue: its CUDA kernels scan all N points per
query from HBM-resident arrays (misc/ops.py:289-327) and its loaders
randomly permute points (data_utils/modelnet40_loader.py:121). Random
permutation at load time means the reference itself attaches no
meaning to point order.

Hilbert keys use Skilling's transpose algorithm (J. Skilling,
"Programming the Hilbert curve", AIP Conf. Proc. 707, 2004) — chosen
over Morton/Z-order because Hilbert has no octant-boundary jumps, so
radius-r neighborhoods map to tighter index windows.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def hilbert_keys(xyz: Array, bits: int = 10,
                 mask: Optional[Array] = None) -> Array:
    """Hilbert-curve index of each point, ``[B, N] int32``.

    ``xyz [B, N, 3]`` is quantized per cloud to a ``2^bits`` grid over
    its bounding box (`bits*3` must fit an int32, so bits <= 10).

    The box is min/max over the rows that define it — so
    **far-coordinate padding rows inflate the box** and collapse the
    real points into a few grid cells, silently degrading
    canonicalization to a near no-op (windowed gathers then take the
    wide fallback: a perf regression, never a correctness issue). For
    padded clouds pass ``mask [B, N] bool`` (True = real point): masked
    rows are excluded from the box and clamp to its corner cell.
    """
    assert bits * 3 <= 31, bits
    side = (1 << bits) - 1
    if mask is not None:
        m = mask[..., None]
        lo = jnp.min(jnp.where(m, xyz, jnp.inf), axis=1, keepdims=True)
        hi = jnp.max(jnp.where(m, xyz, -jnp.inf), axis=1, keepdims=True)
        # all-padding cloud: fall back to a unit box at the origin
        bad = ~jnp.isfinite(lo)
        lo = jnp.where(bad, 0.0, lo)
        hi = jnp.where(bad, 1.0, jnp.where(jnp.isfinite(hi), hi, 1.0))
    else:
        lo = jnp.min(xyz, axis=1, keepdims=True)
        hi = jnp.max(xyz, axis=1, keepdims=True)
    scale = side / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((xyz - lo) * scale, 0, side).astype(jnp.int32)

    x0, x1, x2 = q[..., 0], q[..., 1], q[..., 2]

    # Skilling AxestoTranspose, vectorized (branches -> where)
    m = 1 << (bits - 1)
    qbit = m
    while qbit > 1:
        p = qbit - 1
        for i in range(3):
            xi = (x0, x1, x2)[i]
            cond = (xi & qbit) != 0
            t = (x0 ^ xi) & p
            new_x0 = jnp.where(cond, x0 ^ p, x0 ^ t)
            new_xi = jnp.where(cond, xi, xi ^ t)
            if i == 0:
                # exchange with self is a no-op; only the invert applies
                x0 = jnp.where(cond, x0 ^ p, x0)
            else:
                x0 = new_x0
                if i == 1:
                    x1 = new_xi
                else:
                    x2 = new_xi
        qbit >>= 1

    # Gray encode
    x1 = x1 ^ x0
    x2 = x2 ^ x1
    t = jnp.zeros_like(x0)
    qbit = m
    while qbit > 1:
        t = jnp.where((x2 & qbit) != 0, t ^ (qbit - 1), t)
        qbit >>= 1
    x0, x1, x2 = x0 ^ t, x1 ^ t, x2 ^ t

    # interleave transpose bits, MSB-first: key = x0_b x1_b x2_b ...
    key = jnp.zeros_like(x0)
    for b in range(bits - 1, -1, -1):
        key = (
            (key << 3)
            | (((x0 >> b) & 1) << 2)
            | (((x1 >> b) & 1) << 1)
            | ((x2 >> b) & 1)
        )
    return key


def canonicalize(
    xyz: Array, *arrays: Optional[Array], bits: int = 10,
    mask: Optional[Array] = None,
) -> Tuple[Array, ...]:
    """Sort each cloud by Hilbert key; returns ``(xyz_sorted,
    *arrays_sorted, order)`` where ``order [B, N] int32`` satisfies
    ``sorted = x[order]`` (invert per-point outputs with
    ``jnp.argsort(order)``). ``arrays`` ride along ``axis=1`` — pass
    per-point features, normals, or labels; ``None`` entries pass
    through as ``None``.

    For per-point-padded clouds pass ``mask [B, N] bool`` (True = real
    point): padding rows are excluded from the Hilbert bounding box
    (see :func:`hilbert_keys` — far padding would otherwise collapse
    real points into a few cells) and sort to the END of each cloud so
    real-point tiles stay window-tight. Pass the mask itself through
    ``arrays`` if the reordered mask is needed downstream. Today's
    training batches carry whole clouds (padding is per-sample, not
    per-point), so production callers omit it."""
    keys = hilbert_keys(xyz, bits=bits, mask=mask)
    if mask is not None:
        keys = jnp.where(mask, keys, jnp.int32(2**31 - 1))
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    return (take_rows(xyz, order),
            *[take_rows(a, order) for a in arrays], order)


def take_rows(a: Optional[Array], order: Array) -> Optional[Array]:
    """Reorder ``a [B, N, ...]`` (or ``[B, N]``) rows by ``order
    [B, N]`` — routed through the Pallas gather-as-matmul on TPU
    (XLA's narrow-row gather is ~100x off roofline; integer payloads
    ride exactly through f32, they are small indices/labels)."""
    if a is None:
        return None
    from pointcloudlib_tpu.ops.geometry import index_points

    squeeze = a.ndim == 2
    x = a[..., None] if squeeze else a
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        out = index_points(x.astype(jnp.float32), order).astype(a.dtype)
    elif x.dtype == jnp.float32:
        out = index_points(x, order)
    else:
        out = jnp.take_along_axis(
            x, order[..., None].astype(jnp.int32), axis=1)
    return out[..., 0] if squeeze else out


def unsort_rows(a: Array, order: Array) -> Array:
    """Inverse of ``take_rows``: maps per-point outputs computed in
    canonical order back to the caller's original point order."""
    return take_rows(a, jnp.argsort(order, axis=1).astype(jnp.int32))
