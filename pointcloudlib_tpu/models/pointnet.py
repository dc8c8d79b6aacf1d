"""PointNet classification & part-segmentation, channel-last.

Reference: networks/cls/pointnet.py:9-40 (cls) and
networks/seg/pointnet_partseg.py:14-67 (seg, with STN3d/STNkd spatial
transformers from misc/layers.py:11-92).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudlib_tpu.nn.layers import (
    DenseBNAct,
    PointMLP,
    reference_linear_init,
)

Array = jax.Array


class PointNet(nn.Module):
    """Shared-MLP 3→64→64→64→128→1024, global max, FC 512→n_classes.

    Input ``xyz [B, N, 3]`` (the reference takes ``[B, 3, N]``; the CLI
    adapter transposes — train_cls.py:63).
    """

    n_classes: int = 40
    dropout: float = 0.5  # reference rate; 0 for deterministic tests
    axis_name: Optional[str] = None  # shard_map DP: sync-BN

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        del feats  # xyz-only model
        ax = self.axis_name
        x = PointMLP([64, 64, 64, 128, 1024], axis_name=ax)(xyz, training)
        x = jnp.max(x, axis=1)  # global max pool over points
        x = DenseBNAct(512, axis_name=ax)(x, training)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.Dense(self.n_classes,
                        kernel_init=reference_linear_init)(x)


class STN(nn.Module):
    """Spatial transformer: predicts a ``k×k`` alignment matrix
    (identity-initialised via residual add — misc/layers.py:11-92)."""

    k: int = 3
    axis_name: Optional[str] = None  # shard_map DP: sync-BN

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        h = PointMLP([64, 128, 1024], axis_name=self.axis_name)(x, training)
        h = jnp.max(h, axis=1)
        h = PointMLP([512, 256], axis_name=self.axis_name)(h, training)
        mat = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        return (mat + eye).reshape(-1, self.k, self.k)


class PointNetPartSeg(nn.Module):
    """PointNet part segmentation with input+feature STNs.

    Reference: networks/seg/pointnet_partseg.py:14-67. Head consumes the
    concat of the 2048-d global max, 16-d object one-hot, and all five
    intermediate feature maps (4944 channels total,
    pointnet_partseg.py:60-66).
    """

    part_num: int = 50
    axis_name: Optional[str] = None  # shard_map DP: sync-BN

    @nn.compact
    def __call__(
        self,
        xyz: Array,               # [B, N, 3]
        cls_label: Array,         # [B, 16] one-hot
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        del feats
        ax = self.axis_name
        n = xyz.shape[1]
        trans = STN(k=3, axis_name=ax)(xyz, training)
        x = jnp.einsum("bnc,bcd->bnd", xyz, trans)

        out1 = PointMLP([64], axis_name=ax)(x, training)
        out2 = PointMLP([128], axis_name=ax)(out1, training)
        out3 = PointMLP([128], axis_name=ax)(out2, training)

        ftrans = STN(k=128, axis_name=ax)(out3, training)
        xt = jnp.einsum("bnc,bcd->bnd", out3, ftrans)

        out4 = PointMLP([512], axis_name=ax)(xt, training)
        # conv5+bn5 without relu (pointnet_partseg.py:57)
        out5 = DenseBNAct(2048, act=None, axis_name=ax)(out4, training)

        gmax = jnp.max(out5, axis=1)  # [B, 2048]
        gvec = jnp.concatenate([gmax, cls_label.astype(x.dtype)], -1)
        expand = jnp.broadcast_to(
            gvec[:, None, :], (x.shape[0], n, gvec.shape[-1])
        )
        h = jnp.concatenate([expand, out1, out2, out3, out4, out5], -1)
        h = PointMLP([256, 256, 128], axis_name=ax)(h, training)
        return nn.Dense(self.part_num,
                        kernel_init=reference_linear_init)(h)  # [B, N, parts]
