"""Model zoo registry.

Classification entries take ``(xyz [B,N,3], feats [B,N,C]|None,
training)`` → logits ``[B, n_classes]``. Part-segmentation entries
additionally take a 16-way one-hot object label and return per-point
logits ``[B, N, part_num]``.
"""

from __future__ import annotations

from typing import Callable, Dict

from pointcloudlib_tpu.models.dgcnn import DGCNN, DGCNNPartSeg
from pointcloudlib_tpu.models.kpconv.adapter import (
    KPConvCls,
    KPConvDeformCls,
)
from pointcloudlib_tpu.models.pointcnn import PointCNNCls, PointCNNPartSeg
from pointcloudlib_tpu.models.pointconv import (
    PointConvDensityCls,
    PointConvPartSeg,
)
from pointcloudlib_tpu.models.pointnet import PointNet, PointNetPartSeg
from pointcloudlib_tpu.models.pointnet2 import (
    PointNet2MSG,
    PointNet2PartSeg,
    PointNet2SSG,
)

CLS_MODELS: Dict[str, Callable] = {
    "pointnet": PointNet,
    "pointnet2": PointNet2SSG,
    "pointnet2_msg": PointNet2MSG,
    "dgcnn": DGCNN,
    "pointconv": PointConvDensityCls,
    "pointcnn": PointCNNCls,
    "kpconv": KPConvCls,
    "kpconv_deform": KPConvDeformCls,
}

SEG_MODELS: Dict[str, Callable] = {
    "pointnet": PointNetPartSeg,
    "pointnet2": PointNet2PartSeg,
    "dgcnn": DGCNNPartSeg,
    "pointconv": PointConvPartSeg,
    "pointcnn": PointCNNPartSeg,
}


def dp_kwargs(model_cls, axis_name, world: int = 1) -> Dict:
    """Constructor kwargs to run ``model_cls`` under shard_map data
    parallelism: ``axis_name`` syncs every BatchNorm over the mesh axis
    and ``world`` scales the fused kernels' stat reductions. Filtered to
    the fields the class actually declares (pointcnn/pointconv/kpconv
    derive world from the psum'd counts and take only ``axis_name``).

    No-op (empty) when ``axis_name`` is None — single device or
    jit-SPMD, where XLA inserts the reductions itself.
    """
    import dataclasses

    if axis_name is None:
        return {}
    names = {f.name for f in dataclasses.fields(model_cls)}
    kw = {}
    if "axis_name" in names:
        kw["axis_name"] = axis_name
    if "world" in names:
        kw["world"] = world
    return kw


def get_cls_model(name: str, n_classes: int = 40, **kw):
    if name not in CLS_MODELS:
        raise KeyError(f"unknown cls model {name!r}; have {sorted(CLS_MODELS)}")
    return CLS_MODELS[name](n_classes=n_classes, **kw)


def get_seg_model(name: str, part_num: int = 50, **kw):
    if name not in SEG_MODELS:
        raise KeyError(f"unknown seg model {name!r}; have {sorted(SEG_MODELS)}")
    return SEG_MODELS[name](part_num=part_num, **kw)
