"""Adapter giving KPCNN the common cls-model interface
``(xyz, feats, training) -> logits`` used by the registry/CLI.

The reference instead routes KPConv through a completely separate data
path (KPConvLoader + ModelNet40CustomBatch); here the on-device pyramid
builder lets KPConv consume the same ``[B, N, 3]`` batches as every
other model.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from flax import linen as nn

from pointcloudlib_tpu.models.kpconv.model import KPCNN, KPConvConfig

Array = jax.Array


class KPConvCls(nn.Module):
    n_classes: int = 40
    # ModelNet clouds are unit-sphere normalized; the reference resamples
    # them at dl=0.02 on load (kpconv_loader.py:614-694) — with N≈1024
    # inputs a 0.05 grid gives comparable pyramid occupancy.
    first_subsampling_dl: float = 0.05
    # static pyramid shapes; the CLI passes data-calibrated values
    # (calibrate.calibrate_pyramid), None → uncalibrated defaults
    caps: Optional[Tuple[int, ...]] = None
    neighborhood_limits: Tuple[int, ...] = (22, 35, 41, 42, 37)
    # shard_map DP: sync-BN over this mesh axis (see KPConvConfig)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        del feats  # KPConv uses constant-1 features (in_features_dim=1)
        cfg = KPConvConfig(
            num_classes=self.n_classes,
            first_subsampling_dl=self.first_subsampling_dl,
            caps=self.caps,
            neighborhood_limits=self.neighborhood_limits,
            axis_name=self.axis_name,
        )
        return KPCNN(cfg)(xyz, training=training)


class KPConvDeformCls(nn.Module):
    """Deformable variant: the last two scales use deformable KPConv
    (the KP-Conv paper's KPCNN-deform layout; the block zoo and the
    p2p fitting/repulsive regularizer follow blocks.py:125-359 and
    kpconv.py:12-45)."""

    n_classes: int = 40
    first_subsampling_dl: float = 0.05
    caps: Optional[Tuple[int, ...]] = None
    neighborhood_limits: Tuple[int, ...] = (22, 35, 41, 42, 37)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        del feats
        arch = list(KPConvConfig().architecture)
        arch = [
            b.replace("resnetb", "resnetb_deformable")
            if i >= 9 and b.startswith("resnetb")
            else b
            for i, b in enumerate(arch)
        ]
        cfg = KPConvConfig(
            num_classes=self.n_classes,
            first_subsampling_dl=self.first_subsampling_dl,
            architecture=tuple(arch),
            caps=self.caps,
            neighborhood_limits=self.neighborhood_limits,
            axis_name=self.axis_name,
        )
        return KPCNN(cfg)(xyz, training=training)
