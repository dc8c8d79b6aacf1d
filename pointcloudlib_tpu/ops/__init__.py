"""Neighbor/sampling/grouping ops — the TPU equivalents of the reference's
CUDA kernels (misc/ops.py) and C++ preprocessing (cpp_wrappers/)."""

from pointcloudlib_tpu.ops.dispatch import fps
from pointcloudlib_tpu.ops.geometry import (
    ball_query,
    compute_density,
    farthest_point_sample,
    fps_gather,
    group_all,
    group_points,
    index_points,
    knn,
    knn_points,
    sample_and_group,
    square_distance,
    three_nn,
    three_nn_interpolate,
    top_k,
)
from pointcloudlib_tpu.ops.spatial import (
    canonicalize,
    hilbert_keys,
    take_rows,
    unsort_rows,
)

__all__ = [
    "canonicalize",
    "hilbert_keys",
    "take_rows",
    "unsort_rows",
    "ball_query",
    "fps",
    "compute_density",
    "farthest_point_sample",
    "fps_gather",
    "group_all",
    "group_points",
    "index_points",
    "knn",
    "knn_points",
    "sample_and_group",
    "square_distance",
    "three_nn",
    "top_k",
    "three_nn_interpolate",
]
