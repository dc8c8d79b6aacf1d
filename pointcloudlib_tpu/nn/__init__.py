"""Reusable flax.linen building blocks (TPU equivalents of the
reference's misc/layers.py zoo)."""

from pointcloudlib_tpu.nn.layers import (
    DenseBNAct,
    PointMLP,
    SetAbstraction,
    SetAbstractionMSG,
    FeaturePropagation,
)

__all__ = [
    "DenseBNAct",
    "PointMLP",
    "SetAbstraction",
    "SetAbstractionMSG",
    "FeaturePropagation",
]
