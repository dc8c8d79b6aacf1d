"""PointNet++ SSG / MSG classification.

Reference: networks/cls/pointnet2.py:100-196. Hyperparameters match the
tables there exactly (SA(512, r=.2, k=64, [64,64,128]) → SA(128, r=.4,
k=64, [128,128,256]) → SA(all, [256,512,1024]) → FC 512→256→n_classes,
dropout 0.5). Input features are the raw normals (train_cls.py:67).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudlib_tpu.nn.layers import (
    DenseBNAct,
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMSG,
    reference_linear_init,
)

Array = jax.Array


class _ClsHead(nn.Module):
    n_classes: int
    axis_name: Optional[str] = None
    dropout: float = 0.5  # reference rate; 0 for deterministic tests

    @nn.compact
    def __call__(self, x: Array, training: bool) -> Array:
        x = DenseBNAct(512, axis_name=self.axis_name)(x, training)
        x = DenseBNAct(256, axis_name=self.axis_name)(x, training)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.Dense(self.n_classes,
                        kernel_init=reference_linear_init)(x)


class PointNet2SSG(nn.Module):
    """``axis_name``/``world``: set when the train step runs inside
    shard_map data parallelism — every BatchNorm (fused and unfused)
    syncs its batch statistics across the axis
    (parallel/mesh.py:shard_map_train_step)."""

    n_classes: int = 40
    use_xyz: bool = True
    axis_name: Optional[str] = None
    world: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        ax = dict(axis_name=self.axis_name, world=self.world)
        xyz, f = SetAbstraction(
            mlp=[64, 64, 128], n_points=512, radius=0.2, n_samples=64,
            use_xyz=self.use_xyz, **ax,
        )(xyz, feats, training)
        xyz, f = SetAbstraction(
            mlp=[128, 128, 256], n_points=128, radius=0.4, n_samples=64,
            use_xyz=self.use_xyz, **ax,
        )(xyz, f, training)
        xyz, f = SetAbstraction(
            mlp=[256, 512, 1024], use_xyz=self.use_xyz, **ax,
        )(xyz, f, training)
        return _ClsHead(self.n_classes, axis_name=self.axis_name,
                        dropout=self.dropout)(f[:, 0], training)


class PointNet2PartSeg(nn.Module):
    """PointNet++ SSG part segmentation with feature propagation.

    Reference: networks/seg/pointnet2_partseg.py:110-176. Same SA stack
    as cls; fp3 [256,256], fp2 [256,128], fp1 [128,128,128] with the
    object one-hot + xyz + input features injected at fp1
    (pointnet2_partseg.py:170-173).
    """

    part_num: int = 50
    use_xyz: bool = True
    axis_name: Optional[str] = None   # shard_map DP: sync-BN
    world: int = 1

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        cls_label: Array,          # [B, 16] one-hot
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        b, n, _ = xyz.shape
        ax = dict(axis_name=self.axis_name, world=self.world)
        l1_xyz, l1_f = SetAbstraction(
            mlp=[64, 64, 128], n_points=512, radius=0.2, n_samples=64,
            use_xyz=self.use_xyz, **ax,
        )(xyz, feats, training)
        l2_xyz, l2_f = SetAbstraction(
            mlp=[128, 128, 256], n_points=128, radius=0.4, n_samples=64,
            use_xyz=self.use_xyz, **ax,
        )(l1_xyz, l1_f, training)
        l3_xyz, l3_f = SetAbstraction(
            mlp=[256, 512, 1024], use_xyz=self.use_xyz, **ax,
        )(l2_xyz, l2_f, training)

        l2_f = FeaturePropagation([256, 256], axis_name=self.axis_name)(
            l2_xyz, l3_xyz, l2_f, l3_f, training)
        l1_f = FeaturePropagation([256, 128], axis_name=self.axis_name)(
            l1_xyz, l2_xyz, l1_f, l2_f, training)
        one_hot = jnp.broadcast_to(
            cls_label[:, None, :].astype(xyz.dtype), (b, n, cls_label.shape[-1])
        )
        skip = jnp.concatenate(
            [one_hot, xyz] + ([feats] if feats is not None else []), axis=-1
        )
        f = FeaturePropagation([128, 128, 128],
                               axis_name=self.axis_name)(
            xyz, l1_xyz, skip, l1_f, training)

        # head: conv-BN-dropout-conv (no relu, pointnet2_partseg.py:152-157)
        f = DenseBNAct(128, act=None, use_bias=True,
                       axis_name=self.axis_name)(f, training)
        f = nn.Dropout(0.5, deterministic=not training)(f)
        return nn.Dense(self.part_num,
                        kernel_init=reference_linear_init)(f)


class PointNet2MSG(nn.Module):
    n_classes: int = 40
    use_xyz: bool = True
    axis_name: Optional[str] = None   # shard_map DP: sync-BN
    world: int = 1

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        ax = dict(axis_name=self.axis_name, world=self.world)
        xyz, f = SetAbstractionMSG(
            n_points=512,
            radii=[0.1, 0.2, 0.4],
            n_samples=[16, 32, 128],
            mlps=[[32, 32, 64], [64, 64, 128], [64, 96, 128]],
            use_xyz=self.use_xyz, **ax,
        )(xyz, feats, training)
        xyz, f = SetAbstractionMSG(
            n_points=128,
            radii=[0.2, 0.4, 0.8],
            n_samples=[32, 64, 128],
            mlps=[[64, 64, 128], [128, 128, 256], [128, 128, 256]],
            use_xyz=self.use_xyz, **ax,
        )(xyz, f, training)
        xyz, f = SetAbstraction(
            mlp=[256, 512, 1024], use_xyz=self.use_xyz, **ax,
        )(xyz, f, training)
        return _ClsHead(self.n_classes,
                        axis_name=self.axis_name)(f[:, 0], training)
