"""Host-side KPConv pyramid builder (native C++ backed).

Twin of the on-device builder (models/kpconv/pyramid.py) running on the
CPU input pipeline via the native library — the role the reference's
KPConvLoader plays (data_utils/kpconv_loader.py:493-603 walking
cpp_subsampling/cpp_neighbors per batch). Two uses:

* offline dataset preparation (subsample once, cache — the reference
  caches pickles, kpconv_loader.py:614-694);
* a cross-implementation oracle: tests assert the on-device pyramid
  matches this one on the same inputs.

Outputs the same dense padded layout the model consumes.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from pointcloudlib_tpu import native


def _layer_split(architecture: Sequence[str]) -> int:
    # the device builder's walk is the single source of truth — the
    # host oracle must group layers bit-identically
    from pointcloudlib_tpu.models.kpconv.pyramid import layer_blocks

    return len(layer_blocks(architecture))


def build_pyramid_host(
    xyz: np.ndarray,          # [B, N, 3]
    mask: np.ndarray,         # [B, N] bool
    first_dl: float,
    conv_radius: float,
    architecture: Sequence[str],
    neighborhood_limits: Sequence[int],
    caps: Sequence[int] = None,
    subsample_input: bool = True,
    deform_radius: float = None,
):
    """Returns dict with points/masks/neighbors/pools lists of dense
    numpy arrays (invalid neighbor slots hold the sentinel N_l)."""
    from pointcloudlib_tpu.models.kpconv.pyramid import (
        layer_blocks, layer_deform_flags,
    )

    b, n0, _ = xyz.shape
    n_layers = _layer_split(architecture)
    groups = layer_blocks(architecture)
    if deform_radius is None:
        deform_radius = conv_radius  # widening factor 1: rigid everywhere
    if caps is None:
        from pointcloudlib_tpu.models.kpconv.pyramid import pyramid_shapes

        caps, _ = pyramid_shapes(n0, n_layers, neighborhood_limits)
    ks = list(neighborhood_limits[:n_layers])

    points: List[np.ndarray] = []
    masks: List[np.ndarray] = []
    neighbors: List[np.ndarray] = []
    pools: List[np.ndarray] = []

    def _subsample_batch(pts, msk, dl, cap):
        out_p = np.zeros((b, cap, 3), np.float32)
        out_m = np.zeros((b, cap), bool)
        for i in range(b):
            sub = native.grid_subsample(pts[i][msk[i]], dl, max_out=cap)
            k = len(sub)
            out_p[i, :k] = sub
            out_m[i, :k] = True
        return out_p, out_m

    if subsample_input:
        p0, m0 = _subsample_batch(xyz, mask, first_dl, caps[0])
    else:
        p0, m0 = xyz.astype(np.float32), mask.copy()
    points.append(p0)
    masks.append(m0)

    r = first_dl * conv_radius
    dl = first_dl
    for l in range(n_layers):
        k = ks[l]
        # reference conv/pool deform-radius split (kpconv_loader.py:
        # 527-560) — must match the device builder (pyramid.py)
        deform_conv, deform_pool = layer_deform_flags(groups[l])
        wide = r * (deform_radius / conv_radius)
        r_conv = wide if deform_conv else r
        r_pool = wide if deform_pool else r
        nl = points[l].shape[1]
        idx = np.full((b, points[l].shape[1], k), nl, np.int32)
        for i in range(b):
            valid = masks[l][i]
            nv = int(valid.sum())
            got = native.radius_neighbors(
                points[l][i][:nv], points[l][i][:nv], r_conv, k
            )
            got = np.where(got >= nv, nl, got)
            idx[i, :nv] = got
        neighbors.append(idx)
        if l + 1 < n_layers:
            np1, nm1 = _subsample_batch(points[l], masks[l], 2 * dl,
                                        caps[l + 1])
            pidx = np.full((b, np1.shape[1], k), nl, np.int32)
            for i in range(b):
                nv_q = int(nm1[i].sum())
                nv_s = int(masks[l][i].sum())
                got = native.radius_neighbors(
                    np1[i][:nv_q], points[l][i][:nv_s], r_pool, k
                )
                pidx[i, :nv_q] = np.where(got >= nv_s, nl, got)
            points.append(np1)
            masks.append(nm1)
            pools.append(pidx)
            dl *= 2
            r *= 2
    return {
        "points": points,
        "masks": masks,
        "neighbors": neighbors,
        "pools": pools,
    }
