"""KPConv: kernel-point convolution networks, TPU-native.

The reference builds its multi-scale pyramid on the CPU per batch via
C++ extensions (grid subsampling + nanoflann radius neighbors,
cpp_wrappers/, driven by data_utils/kpconv_loader.py:493-603) and feeds
ragged stacked tensors. Here the whole pyramid is built **on device**
inside jit (pyramid.py) over dense padded ``[B, N_l, ...]`` arrays with
validity masks, so there is no host round-trip and one compiled program
serves every batch.
"""

from pointcloudlib_tpu.models.kpconv.kernel_points import load_kernels
from pointcloudlib_tpu.models.kpconv.model import KPCNN, KPConvConfig
from pointcloudlib_tpu.models.kpconv.pyramid import (
    Pyramid,
    build_pyramid,
    grid_subsample,
    radius_neighbors,
)

__all__ = [
    "KPCNN",
    "KPConvConfig",
    "Pyramid",
    "build_pyramid",
    "grid_subsample",
    "load_kernels",
    "radius_neighbors",
]
