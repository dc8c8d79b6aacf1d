"""On-device multi-scale pyramid: grid subsampling + radius neighbors.

TPU replacement for the reference's per-batch CPU preprocessing
(cpp_wrappers grid_subsampling.cpp:109 / neighbors.cpp:211, driven by
classification_inputs, data_utils/kpconv_loader.py:493-603). Everything
here is jit-compiled, static-shape, and mask-based:

* ``grid_subsample`` — voxel binning via quantize → sort → segment-sum
  barycenters, padded to a static ``n_max`` voxels;
* ``radius_neighbors`` — k *nearest* supports within the radius
  (the reference sorts all in-radius neighbors by distance and trims to
  ``neighborhood_limits`` [22,35,41,42,37], kpconv_loader.py:705,796-805
  — identical semantics with k = the limit);
* ``build_pyramid`` — walks the architecture the same way the reference
  loader does (radius neighbors at each layer, stride-2 voxel pooling
  between layers).

Invalid neighbor slots hold the sentinel ``N_l`` (one-past-the-end),
mirroring the reference's shadow-point convention (blocks.py:258) but
carried alongside an explicit boolean mask.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_GRID = 1024  # voxel coordinates clamped to [0, _GRID) per axis


def _voxel_keys(xyz: Array, mask: Array, dl: float) -> Array:
    """Packed voxel key per point (masked rows get INT32_MAX). Shift by
    whole cells (the reference's originCorner = floor(min/dl)*dl,
    grid_subsampling.cpp) so the voxel partition is exactly
    floor(p/dl) — a raw-min shift would move cell boundaries. ONE
    definition: grid_subsample, occupancy and the host-side
    calibrate.occupancy_np must quantize bit-identically (parity
    asserted in tests/test_kpconv_pipeline.py)."""
    origin = jnp.min(jnp.where(mask[:, None], xyz, jnp.inf), axis=0)
    origin_cell = jnp.floor(origin / dl)
    v = jnp.clip(
        (jnp.floor(xyz / dl) - origin_cell).astype(jnp.int32),
        0,
        _GRID - 1,
    )
    key = (v[:, 0] * _GRID + v[:, 1]) * _GRID + v[:, 2]
    return jnp.where(mask, key, jnp.iinfo(jnp.int32).max)


def _grid_subsample_one(
    xyz: Array, mask: Array, dl: float, n_max: int
) -> Tuple[Array, Array, Array]:
    """One cloud: ``xyz [N,3]``, ``mask [N]`` → ``(centers [n_max,3],
    vmask [n_max], dropped [])``. Barycenter per occupied voxel
    (reference grid_subsampling.cpp:5-107 semantics). ``dropped`` is the
    number of occupied voxels truncated by the static cap — free to
    compute (the voxel count already exists as ``sum(first)``) and the
    overflow signal the trainer surfaces (a silently mis-calibrated cap
    otherwise degrades accuracy with no symptom)."""
    n = xyz.shape[0]
    key = _voxel_keys(xyz, mask, dl)

    order = jnp.argsort(key)
    sk = key[order]
    sx = xyz[order]
    smask = mask[order]

    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    ) & smask
    rank = jnp.cumsum(first) - 1  # voxel ordinal per sorted point
    seg = jnp.where(smask & (rank < n_max), rank, n_max)

    sums = jax.ops.segment_sum(
        jnp.where(smask[:, None], sx, 0.0), seg, num_segments=n_max + 1
    )[:n_max]
    cnt = jax.ops.segment_sum(
        smask.astype(jnp.float32), seg, num_segments=n_max + 1
    )[:n_max]
    centers = sums / jnp.maximum(cnt[:, None], 1.0)
    dropped = jnp.maximum(jnp.sum(first.astype(jnp.int32)) - n_max, 0)
    return centers, cnt > 0, dropped


def grid_subsample(
    xyz: Array, mask: Array, dl: float, n_max: int
) -> Tuple[Array, Array]:
    """Batched voxel-grid subsampling ``[B,N,3] → [B,n_max,3]`` + mask."""
    return grid_subsample_counted(xyz, mask, dl, n_max)[:2]


def grid_subsample_counted(
    xyz: Array, mask: Array, dl: float, n_max: int
) -> Tuple[Array, Array, Array]:
    """:func:`grid_subsample` + per-cloud truncated-voxel count ``[B]``."""
    return jax.vmap(
        functools.partial(_grid_subsample_one, dl=dl, n_max=n_max)
    )(xyz, mask)


def occupancy(xyz: Array, mask: Array, dl: float) -> Array:
    """Occupied-voxel count per cloud ``[B]`` — calibration input and
    overflow detector: ``occupancy(...) > n_max`` means ``grid_subsample``
    with that cap would silently drop voxels (the truncation at
    ``rank < n_max`` above)."""

    def one(x, m):
        sk = jnp.sort(_voxel_keys(x, m, dl))
        sm = jnp.sort(m)[::-1]  # mask count aligned with sorted keys
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
        ) & sm
        return jnp.sum(first.astype(jnp.int32))

    return jax.vmap(one)(xyz, mask)


def neighbor_counts(
    query: Array, qmask: Array, support: Array, smask: Array, radius: float
) -> Array:
    """Uncapped in-radius neighbor count per query ``[B, M]`` (invalid
    queries report 0). Calibration measures these to set the per-layer
    ``neighborhood_limits`` so ~90% of neighborhoods are untouched —
    real computation of what the reference freezes as constants
    (kpconv_loader.py:696-706 returns hardcoded values; the original
    KPConv computes exactly this percentile)."""
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)
    s2 = jnp.sum(support * support, axis=-1, keepdims=True)
    inner = jnp.einsum(
        "bmc,bnc->bmn", query, support,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(q2 - 2 * inner + jnp.swapaxes(s2, -1, -2), 0.0)
    valid = smask[:, None, :] & (d2 < radius * radius)
    return jnp.sum(valid, axis=-1) * qmask.astype(jnp.int32)


def radius_neighbors(
    query: Array,
    qmask: Array,
    support: Array,
    smask: Array,
    radius: float,
    k: int,
) -> Tuple[Array, Array]:
    """k nearest in-radius supports per query.

    Returns ``(idx [B,M,k] int32, nmask [B,M,k] bool)``; invalid slots
    hold the shadow sentinel ``N`` (one-past-the-end of the support set).
    """
    n = support.shape[1]
    kk = min(k, n)
    from pointcloudlib_tpu.ops.dispatch import USE_PALLAS

    if USE_PALLAS and n >= 256 and query.dtype == jnp.float32:
        # fused Pallas kNN over masked supports: XLA's top_k writes the
        # [B,M,N] keyed matrix to HBM and full-sorts each row (2x
        # slower, scripts/bench_knn_slope.py). Masked supports move to
        # a far coordinate, exactly like the kernel's own padding; the
        # exact flag forces f32 cross terms so borderline in-radius
        # membership matches the host/native builder bit-for-bit.
        from pointcloudlib_tpu.ops.pallas.neighbors import knn_pallas

        far = jnp.asarray(1e9, query.dtype)
        sup = jnp.where(smask[..., None], support, far)
        d2k, idx = knn_pallas(
            query, sup, kk, exact=True,
            interpret=jax.default_backend() != "tpu",
        )
        nmask = d2k < radius * radius
    else:
        q2 = jnp.sum(query * query, axis=-1, keepdims=True)
        s2 = jnp.sum(support * support, axis=-1, keepdims=True)
        # exact f32: TPU's default bf16 cross term can flip borderline
        # in-radius membership relative to the host/native builder
        inner = jnp.einsum(
            "bmc,bnc->bmn", query, support,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        d2 = jnp.maximum(q2 - 2 * inner + jnp.swapaxes(s2, -1, -2), 0.0)
        valid = smask[:, None, :] & (d2 < radius * radius)
        keyed = jnp.where(valid, d2, jnp.inf)
        neg, idx = lax.top_k(-keyed, kk)
        nmask = neg > -jnp.inf
    if k > n:
        idx = jnp.concatenate(
            [idx, jnp.zeros((*idx.shape[:-1], k - n), idx.dtype)], -1
        )
        nmask = jnp.concatenate(
            [nmask, jnp.zeros((*nmask.shape[:-1], k - n), bool)], -1
        )
    nmask = nmask & qmask[:, :, None]
    idx = jnp.where(nmask, idx, n)  # shadow sentinel
    return idx.astype(jnp.int32), nmask


class Pyramid(NamedTuple):
    """Static-shape multi-scale structure consumed by the KPConv blocks.

    Per layer l (list entries): points ``[B, N_l, 3]``, masks
    ``[B, N_l]``, neighbors ``[B, N_l, K_l]`` (self-layer), and for
    l < L-1 pools ``[B, N_{l+1}, K_l]`` (stride-2 downsampling links into
    layer l). The reference's flat 4L+5 input list
    (kpconv_loader.py:600-603) carries the same content as ragged
    tensors.
    """

    points: List[Array]
    masks: List[Array]
    neighbors: List[Array]
    neighbor_masks: List[Array]
    pools: List[Array]
    pool_masks: List[Array]
    # [B, n_subsample_sites] truncated-voxel counts (0 = lossless; a
    # nonzero column means that level's static cap clipped real voxels)
    overflow: Optional[Array] = None


def layer_blocks(architecture: Sequence[str]) -> List[List[str]]:
    """Split an architecture string list into per-layer block groups the
    same way the reference loader walks it (kpconv_loader.py:507-529)."""
    groups: List[List[str]] = [[]]
    for block in architecture:
        if "global" in block or "upsample" in block:
            break
        groups[-1].append(block)
        if "pool" in block or "strided" in block:
            groups.append([])
    return groups


def layer_deform_flags(blocks: Sequence[str]) -> Tuple[bool, bool]:
    """(deform_conv, deform_pool) for one layer group, per the
    reference loader (kpconv_loader.py:527-560): conv neighbors use the
    deform radius iff any NON-strided block is deformable; pool
    neighbors iff the strided/pool block itself is."""
    conv = any("deformable" in bl for bl in blocks
               if not ("pool" in bl or "strided" in bl))
    pool = any("deformable" in bl for bl in blocks
               if "pool" in bl or "strided" in bl)
    return conv, pool


def pyramid_shapes(
    n_points: int, n_layers: int, neighborhood_limits: Sequence[int]
) -> Tuple[List[int], List[int]]:
    """Static per-layer point caps (~1/4 per level like the reference's
    stride-2 voxel pooling in 2.5D-occupied space) and neighbor widths."""
    caps = [max(16, n_points // (4**l)) for l in range(n_layers)]
    ks = list(neighborhood_limits[:n_layers])
    return caps, ks


def build_pyramid(
    xyz: Array,
    mask: Array,
    first_dl: float,
    conv_radius: float,
    deform_radius: float,
    architecture: Sequence[str],
    neighborhood_limits: Sequence[int],
    subsample_input: bool = True,
    caps: Optional[Sequence[int]] = None,
) -> Pyramid:
    """Walk the architecture string list and build every layer's
    points/neighbors/pools (mirrors classification_inputs,
    kpconv_loader.py:493-603, but batched, dense and on device)."""
    groups = layer_blocks(architecture)
    n_layers = len(groups)

    b, n0, _ = xyz.shape
    default_caps, ks = pyramid_shapes(n0, n_layers, neighborhood_limits)
    if caps is None:
        caps = default_caps

    points, masks, overflow = [], [], []
    if subsample_input:
        p0, m0, d0 = grid_subsample_counted(xyz, mask, first_dl, caps[0])
        overflow.append(d0)
    else:
        p0, m0 = xyz, mask
    points.append(p0)
    masks.append(m0)

    neighbors, nmasks, pools, pmasks = [], [], [], []
    r = first_dl * conv_radius
    dl = first_dl
    for l, blocks in enumerate(groups):
        # Reference semantics (kpconv_loader.py:527-560): the CONV
        # neighbor radius widens iff a NON-strided block of the layer
        # is deformable; the POOL radius widens iff the strided block
        # ITSELF is. A mixed layer (rigid convs + deformable strided,
        # or vice versa) uses different radii for the two queries.
        deform_conv, deform_pool = layer_deform_flags(blocks)
        wide = r * (deform_radius / conv_radius)
        idx, nm = radius_neighbors(
            points[l], masks[l], points[l], masks[l],
            wide if deform_conv else r, ks[l]
        )
        neighbors.append(idx)
        nmasks.append(nm)
        if l + 1 < n_layers:
            nxt_p, nxt_m, nxt_d = grid_subsample_counted(
                points[l], masks[l], 2 * dl, caps[l + 1]
            )
            overflow.append(nxt_d)
            pidx, pm = radius_neighbors(
                nxt_p, nxt_m, points[l], masks[l],
                wide if deform_pool else r, ks[l]
            )
            points.append(nxt_p)
            masks.append(nxt_m)
            pools.append(pidx)
            pmasks.append(pm)
            dl *= 2
            r *= 2
    ov = jnp.stack(overflow, axis=1) if overflow else None
    return Pyramid(points, masks, neighbors, nmasks, pools, pmasks, ov)
