"""Data layer: dataset loaders, augments, static-shape batching."""

from pointcloudlib_tpu.data.loader import (
    cls_batches,
    kpconv_cls_batches,
    prefetch,
    seg_batches,
)
from pointcloudlib_tpu.data.modelnet40 import ModelNet40, make_modelnet40
from pointcloudlib_tpu.data.sampler import PotentialSampler, kpconv_augment
from pointcloudlib_tpu.data.synthetic import (
    SyntheticModelNet,
    SyntheticShapeNetPart,
)

__all__ = [
    "ModelNet40",
    "PotentialSampler",
    "SyntheticModelNet",
    "SyntheticShapeNetPart",
    "cls_batches",
    "kpconv_augment",
    "kpconv_cls_batches",
    "prefetch",
    "make_modelnet40",
    "seg_batches",
]
