"""Pyramid calibration from data: per-layer point caps + neighbor widths.

The original KPConv calibrates its ``neighborhood_limits`` so that ~90%
of neighborhoods remain untouched and its batch budget from observed
cloud sizes; the reference snapshot freezes both as constants and
hard-exits when its calibration pickles are missing
(data_utils/kpconv_loader.py:696-706, datasets/ModelNet40.py:726-830).
Here calibration is an actual computation: walk the pyramid over a data
sample, measure per-layer voxel occupancy and uncapped in-radius
neighbor counts, and derive

* ``caps[l]``   — static voxel budget per layer: the max observed
  occupancy with a safety margin, rounded up to a multiple of 8 (TPU
  sublane). With the margin, ``grid_subsample`` never truncates on data
  like the sample; ``occupancy()`` lets callers verify (overflow is
  logged, not silent).
* ``limits[l]`` — neighbor width: the ``untouched_ratio`` quantile of
  in-radius counts (reference semantics: 90% of neighborhoods keep all
  their neighbors).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import numpy as np

from pointcloudlib_tpu.models.kpconv.pyramid import (
    grid_subsample,
    layer_blocks,
    neighbor_counts,
    occupancy,
)


@dataclasses.dataclass(frozen=True)
class PyramidCalibration:
    caps: Tuple[int, ...]                 # per-layer static point budget
    neighborhood_limits: Tuple[int, ...]  # per-layer neighbor width
    max_occupancy: Tuple[int, ...]        # observed max voxels per layer
    mean_neighbors: Tuple[float, ...]     # observed mean in-radius count

    def describe(self) -> str:
        return (
            f"caps={list(self.caps)} "
            f"neighborhood_limits={list(self.neighborhood_limits)} "
            f"(max occupancy {list(self.max_occupancy)}, "
            f"mean neighbors {[round(m, 1) for m in self.mean_neighbors]})"
        )


def _round8(n: int) -> int:
    return max(8, (n + 7) // 8 * 8)


def _round_cap(n: int) -> int:
    """Voxel caps above 256 round to the NEAREST multiple of 64: the
    Pallas kNN/radius row tiles must be multiple-of-8 DIVISORS of the
    layer size ≤ 256, and an awkward cap like 904 (= 8·113) leaves
    mt=8 as the only legal tile — 113 grid steps per cloud of pure
    loop overhead (measured r5: the two big-layer radius searches at
    caps (904, 632) cost 7.3/6.6 ms standalone vs ~1.5 tile-friendly;
    pyramid 21.5 → 11.0 ms in one jit). Caps ≤ 256 keep 8-granularity
    — the whole layer is one tile there, and coarse layers are where
    rounding error would actually truncate voxels."""
    if n > 256:
        return (n + 32) // 64 * 64
    return _round8(n)


def calibrate_pyramid(
    clouds: np.ndarray,
    first_dl: float,
    conv_radius: float,
    deform_radius: float,
    architecture: Sequence[str],
    untouched_ratio: float = 0.9,
    margin: float = 1.15,
    subsample_input: bool = True,
    cap_quantile: float | None = None,
) -> PyramidCalibration:
    """Measure a sample of clouds ``[S, N, 3]`` and derive static pyramid
    shapes. Mirrors the classification_inputs walk
    (kpconv_loader.py:493-603) with the original KPConv's calibration
    semantics instead of its frozen constants.

    ``cap_quantile`` (round 5): derive each layer's voxel cap from that
    occupancy quantile instead of the observed max — clouds above it
    get truncated by ``grid_subsample``'s static cap (counted by its
    ``dropped`` output, surfaced by the trainer), exactly the
    ``untouched_ratio`` idea applied to voxel budgets. The r4 A/B
    showed truncation-free caps double the padded work on surface
    clouds (238 vs 459 sa/s, docs/DESIGN.md); the reference equivalent
    is its ``max_p`` batch-point cap (kpconv_loader.py:704), which
    also truncates. ``None`` keeps the truncation-free maxima.
    Layers after a capped one are measured on the TRUNCATED pyramid —
    consistent with what the model sees at runtime."""
    clouds = np.asarray(clouds, np.float32)
    s, n, _ = clouds.shape
    mask = np.ones((s, n), bool)
    groups = layer_blocks(architecture)
    n_layers = len(groups)

    sub = jax.jit(grid_subsample, static_argnames=("dl", "n_max"))
    occ = jax.jit(occupancy, static_argnames=("dl",))
    cnt = jax.jit(neighbor_counts, static_argnames=("radius",))

    caps: List[int] = []
    limits: List[int] = []
    max_occ: List[int] = []
    mean_nb: List[float] = []

    pts, msk = clouds, mask
    r = first_dl * conv_radius
    dl = first_dl

    def _cap_from(o: np.ndarray) -> int:
        budget = (o.max() if cap_quantile is None
                  else np.quantile(o, cap_quantile))
        return _round_cap(int(np.ceil(budget * margin)))

    for l, blocks in enumerate(groups):
        if l == 0:
            if subsample_input:
                o = np.asarray(occ(pts, msk, dl=dl))
                cap = min(_cap_from(o), n)
                pts, msk = sub(pts, msk, dl=dl, n_max=cap)
            else:
                o = np.full((s,), n)
                cap = n
        else:
            o = np.asarray(occ(pts, msk, dl=2 * dl))
            cap = min(_cap_from(o), pts.shape[1])
            pts, msk = sub(pts, msk, dl=2 * dl, n_max=cap)
            dl *= 2
            r *= 2
        caps.append(cap)
        max_occ.append(int(o.max()))

        deform = any("deformable" in bl for bl in blocks)
        r_l = r * (deform_radius / conv_radius) if deform else r
        counts = np.asarray(cnt(pts, msk, pts, msk, radius=r_l))
        valid = counts[np.asarray(msk)]
        limits.append(
            max(1, int(np.ceil(np.quantile(valid, untouched_ratio))))
        )
        mean_nb.append(float(valid.mean()))

    return PyramidCalibration(
        caps=tuple(caps),
        neighborhood_limits=tuple(limits),
        max_occupancy=tuple(max_occ),
        mean_neighbors=tuple(mean_nb),
    )


# ------------------------------------------------------------------
# Occupancy-bucketed batch shapes (round 2).
#
# One global calibration caps every layer at the max observed occupancy
# × margin, so a typical batch runs mostly padding: measured on the
# synthetic ModelNet proxy, mean valid-point fraction per layer is
# [0.75, 0.47, 0.30, 0.24, 0.24] (docs/DESIGN.md "KPConv batch
# padding"). The reference solves this with dynamic point-budget
# batching (kpconv_loader.py:704,709-794) — impossible with static XLA
# shapes. The TPU-correct equivalent: split clouds into a few occupancy
# buckets, calibrate caps per bucket, and compile one program per
# bucket (SURVEY §7). Parameters are shape-independent, so all bucket
# programs share one train state.


def occupancy_np(cloud: np.ndarray, dl: float) -> int:
    """Host-side occupied-voxel count — replicates pyramid.occupancy's
    key convention exactly (same grid constant, same origin-cell
    shift) so bucket assignment at batch time agrees with calibration
    (parity asserted in tests/test_kpconv_pipeline.py)."""
    from pointcloudlib_tpu.models.kpconv.pyramid import _GRID

    origin_cell = np.floor(cloud.min(0) / dl)
    v = np.clip((np.floor(cloud / dl) - origin_cell).astype(np.int64),
                0, _GRID - 1)
    key = (v[:, 0] * _GRID + v[:, 1]) * _GRID + v[:, 2]
    return int(np.unique(key).size)


@dataclasses.dataclass(frozen=True)
class BucketedCalibration:
    """Per-bucket pyramid shapes + the layer-0 occupancy bounds that
    route a cloud to its bucket."""

    buckets: Tuple[PyramidCalibration, ...]
    bounds: Tuple[int, ...]   # upper bounds, len == n_buckets - 1
    first_dl: float

    def bucket_of(self, cloud: np.ndarray) -> int:
        o = occupancy_np(cloud, self.first_dl)
        for b, hi in enumerate(self.bounds):
            if o <= hi:
                return b
        return len(self.buckets) - 1

    def describe(self) -> str:
        parts = [
            f"bucket {b} (occ<= {'inf' if b >= len(self.bounds) else self.bounds[b]}): "
            f"caps={list(c.caps)}"
            for b, c in enumerate(self.buckets)
        ]
        return "; ".join(parts)

    def merged(self) -> PyramidCalibration:
        """Element-wise max across buckets — shapes safe for ANY cloud.

        The init/eval model must use this, not ``buckets[-1]``: a
        bucket's ``neighborhood_limits`` are quantiles measured only on
        its own occupancy class, and LOW-occupancy clouds are spatially
        denser (same points in fewer voxels), so their in-radius counts
        can exceed the top bucket's limits — evaluating every cloud at
        ``buckets[-1]`` shapes would silently over-truncate neighbors
        for the low buckets."""
        n_layers = len(self.buckets[0].caps)
        return PyramidCalibration(
            caps=tuple(max(c.caps[l] for c in self.buckets)
                       for l in range(n_layers)),
            neighborhood_limits=tuple(
                max(c.neighborhood_limits[l] for c in self.buckets)
                for l in range(n_layers)),
            max_occupancy=tuple(
                max(c.max_occupancy[l] for c in self.buckets)
                for l in range(n_layers)),
            mean_neighbors=tuple(
                float(np.mean([c.mean_neighbors[l] for c in self.buckets]))
                for l in range(n_layers)),
        )


def calibrate_buckets(
    clouds: np.ndarray,
    first_dl: float,
    conv_radius: float,
    deform_radius: float,
    architecture: Sequence[str],
    n_buckets: int = 2,
    **kw,
) -> BucketedCalibration:
    """Quantile-split the sample by layer-0 occupancy and calibrate
    each bucket independently. ``n_buckets=1`` degenerates to one
    global calibration."""
    clouds = np.asarray(clouds, np.float32)
    occ = np.array([occupancy_np(c, first_dl) for c in clouds])
    qs = [int(np.quantile(occ, i / n_buckets))
          for i in range(1, n_buckets)]
    assign = np.searchsorted(qs, occ, side="left")
    cals = []
    for b in range(n_buckets):
        sel = clouds[assign == b]
        if len(sel) < 4:  # degenerate bucket: calibrate on everything
            sel = clouds
        cals.append(calibrate_pyramid(
            sel, first_dl, conv_radius, deform_radius, architecture,
            **kw))
    return BucketedCalibration(tuple(cals), tuple(qs), first_dl)
