"""DGCNN classification (dynamic graph CNN with EdgeConv).

Reference: networks/cls/dgcnn.py:61-122. k=20, edge features
``concat(x_j - x_i, x_i)`` (dgcnn.py:29-50), four EdgeConvs
(64,64,128,256), conv5→1024 on the concat, global max+mean pooling,
LeakyReLU(0.2) throughout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudlib_tpu.nn.layers import DenseBNAct, reference_linear_init
from pointcloudlib_tpu.ops import index_points, knn

Array = jax.Array


def edge_features(x: Array, k: int) -> Array:
    """Dynamic-graph edge features ``[B, N, k, 2C]``: kNN in the current
    feature space, then ``concat(neighbor - center, center)``
    (reference get_graph_feature, networks/cls/dgcnn.py:29-50)."""
    _, idx = knn(x, x, k)
    nbr = index_points(x, idx)  # [B, N, k, C]
    ctr = jnp.broadcast_to(x[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


def _lrelu(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.2)


class EdgeConv(nn.Module):
    """One EdgeConv: pointwise Dense+BN+LeakyReLU on the edge features,
    max over the neighbor axis.

    On TPU dispatches to the fused Pallas path (FusedEdgeConv) — the
    edge tensor never materializes. The two paths declare different
    parameter trees; utils/interop.convert_variables converts
    checkpoints between them."""

    features: int
    k: int
    axis_name: Optional[str] = None   # shard_map DP: sync-BN
    world: int = 1

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        from pointcloudlib_tpu.nn.layers import _fused_sa_enabled

        if _fused_sa_enabled():
            return FusedEdgeConv(
                self.features, self.k, axis_name=self.axis_name,
                world=self.world)(x, training)
        e = edge_features(x, self.k)
        h = DenseBNAct(self.features, act=_lrelu,
                       axis_name=self.axis_name)(e, training)
        return jnp.max(h, axis=2)


class FusedEdgeConv(nn.Module):
    """EdgeConv via ops/pallas/fused_edge.py: the kNN gather rides the
    MXU matmul (h = Q[idx] − Off with Q = X·Wa, Off = X·(Wa−Wb)), BN +
    LeakyReLU + max stay in VMEM. Matches the unfused path to bf16
    rounding; BN semantics identical (stats over every edge row)."""

    features: int
    k: int
    slope: float = 0.2
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None   # shard_map DP: sync-BN psums
    world: int = 1

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        from pointcloudlib_tpu.ops.pallas.fused_edge import (
            EdgeStats,
            fused_edge_conv,
            fused_edge_conv_knn,
            fused_edge_eval,
            fused_edge_eval_knn,
        )

        interpret = jax.default_backend() != "tpu"
        c = x.shape[-1]
        n = x.shape[1]
        # with lane-tiled N the kNN graph is built inside the gather
        # kernel (fused_edge_conv_knn / fused_edge_eval_knn)
        fuse_knn = n % 128 == 0
        if not fuse_knn:
            _, idx = knn(x, x, self.k)
            idx = jax.lax.stop_gradient(idx)

        w = self.param("w", reference_linear_init,
                       (2 * c, self.features), jnp.float32)
        wa, wb = w[:c], w[c:]
        # match nn.Dense(dtype=bf16): bf16 operands, f32 accumulation
        q = jnp.dot(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        off = jnp.dot(x.astype(jnp.bfloat16),
                      (wa - wb).astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        gamma = self.param("bn_scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        beta = self.param("bn_bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))

        if training:
            if fuse_knn:
                out, stats = fused_edge_conv_knn(
                    x, q, off, gamma, beta, self.k, self.slope,
                    interpret, self.axis_name, self.world)
            else:
                out, stats = fused_edge_conv(
                    q, off, idx, gamma, beta, self.slope, interpret,
                    self.axis_name, self.world)
            if not self.is_initializing():
                mom = self.bn_momentum
                ra_mean.value = mom * ra_mean.value + (1 - mom) * stats.mean
                ra_var.value = mom * ra_var.value + (1 - mom) * stats.var
        elif fuse_knn:
            out = fused_edge_eval_knn(
                x, q, off, gamma, beta,
                EdgeStats(ra_mean.value, ra_var.value),
                self.k, self.slope, interpret)
        else:
            out = fused_edge_eval(
                q, off, idx, gamma, beta,
                EdgeStats(ra_mean.value, ra_var.value),
                self.slope, interpret)
        return out


class Fused2EdgeConv(nn.Module):
    """Two-layer EdgeConv (the DGCNN partseg pair: two Dense+BN+lrelu on
    the edge features, then max) via ops/pallas/fused_edge.py."""

    features: Tuple[int, int]
    k: int
    slope: float = 0.2
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    world: int = 1

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        from pointcloudlib_tpu.ops.pallas.fused_edge import (
            Edge2Stats,
            fused_edge2_conv,
            fused_edge2_conv_knn,
            fused_edge2_eval,
            fused_edge2_eval_knn,
        )

        interpret = jax.default_backend() != "tpu"
        c = x.shape[-1]
        n = x.shape[1]
        f1, f2 = self.features
        fuse_knn = n % 128 == 0  # graph built inside the gather kernel
        if not fuse_knn:
            _, idx = knn(x, x, self.k)
            idx = jax.lax.stop_gradient(idx)

        w = self.param("w", reference_linear_init,
                       (2 * c, f1), jnp.float32)
        wa, wb = w[:c], w[c:]
        q = jnp.dot(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        off = jnp.dot(x.astype(jnp.bfloat16),
                      (wa - wb).astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        w2 = self.param("w2", reference_linear_init,
                        (f1, f2), jnp.float32)
        g1 = self.param("bn1_scale", nn.initializers.ones, (f1,))
        b1 = self.param("bn1_bias", nn.initializers.zeros, (f1,))
        g2 = self.param("bn2_scale", nn.initializers.ones, (f2,))
        b2 = self.param("bn2_bias", nn.initializers.zeros, (f2,))
        ra = [
            (self.variable("batch_stats", f"mean{l}",
                           lambda c_=c_: jnp.zeros((c_,), jnp.float32)),
             self.variable("batch_stats", f"var{l}",
                           lambda c_=c_: jnp.ones((c_,), jnp.float32)))
            for l, c_ in ((1, f1), (2, f2))
        ]

        if training:
            if fuse_knn:
                out, stats = fused_edge2_conv_knn(
                    x, q, off, w2, g1, b1, g2, b2, self.k, self.slope,
                    interpret, self.axis_name, self.world)
            else:
                out, stats = fused_edge2_conv(
                    q, off, idx, w2, g1, b1, g2, b2, self.slope,
                    interpret, self.axis_name, self.world)
            if not self.is_initializing():
                mom = self.bn_momentum
                batch = [(stats.m1, stats.v1), (stats.m2, stats.v2)]
                for (rm, rv), (bm, bv) in zip(ra, batch):
                    rm.value = mom * rm.value + (1 - mom) * bm
                    rv.value = mom * rv.value + (1 - mom) * bv
        elif fuse_knn:
            out = fused_edge2_eval_knn(
                x, q, off, w2, g1, b1, g2, b2,
                Edge2Stats(ra[0][0].value, ra[0][1].value,
                           ra[1][0].value, ra[1][1].value),
                self.k, self.slope, interpret)
        else:
            out = fused_edge2_eval(
                q, off, idx, w2, g1, b1, g2, b2,
                Edge2Stats(ra[0][0].value, ra[0][1].value,
                           ra[1][0].value, ra[1][1].value),
                self.slope, interpret)
        return out


class DGCNN(nn.Module):
    n_classes: int = 40
    k: int = 20
    dropout: float = 0.5        # reference rate; 0 for the train-
    axis_name: Optional[str] = None   # equivalence tests (mirror has
    world: int = 1                    # no dropout); shard_map sync-BN

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feats: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        del feats  # xyz-only model
        ax = dict(axis_name=self.axis_name, world=self.world)
        x1 = EdgeConv(64, self.k, **ax)(xyz, training)
        x2 = EdgeConv(64, self.k, **ax)(x1, training)
        x3 = EdgeConv(128, self.k, **ax)(x2, training)
        x4 = EdgeConv(256, self.k, **ax)(x3, training)
        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 512]
        x = DenseBNAct(1024, act=_lrelu,
                       axis_name=self.axis_name)(x, training)
        x = jnp.concatenate([jnp.max(x, axis=1), jnp.mean(x, axis=1)], -1)
        x = DenseBNAct(512, act=_lrelu,
                       axis_name=self.axis_name)(x, training)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = DenseBNAct(256, act=_lrelu, use_bias=True,
                       axis_name=self.axis_name)(x, training)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.Dense(self.n_classes,
                        kernel_init=reference_linear_init)(x)


class DGCNNPartSeg(nn.Module):
    """DGCNN part segmentation (networks/seg/dgcnn_partseg.py:35-128).

    k=40; EdgeConv pairs (64,64)→max, (64,64)→max, (64)→max; conv6→1024
    global max; label embedding 16→64; decoder 1280→256→256→128→parts
    with dropout 0.5 twice, LeakyReLU(0.2), final conv bias-free.
    """

    part_num: int = 50
    k: int = 40
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
        del feats
        b, n, _ = xyz.shape

        from pointcloudlib_tpu.nn.layers import _fused_sa_enabled

        axw = dict(axis_name=self.axis_name, world=self.world)
        ax = dict(axis_name=self.axis_name)
        if _fused_sa_enabled():
            x1 = Fused2EdgeConv((64, 64), self.k, **axw)(xyz, training)
            x2 = Fused2EdgeConv((64, 64), self.k, **axw)(x1, training)
            x3 = FusedEdgeConv(64, self.k, **axw)(x2, training)
        else:
            e = edge_features(xyz, self.k)
            e = DenseBNAct(64, act=_lrelu, **ax)(e, training)
            e = DenseBNAct(64, act=_lrelu, **ax)(e, training)
            x1 = jnp.max(e, axis=2)

            e = edge_features(x1, self.k)
            e = DenseBNAct(64, act=_lrelu, **ax)(e, training)
            e = DenseBNAct(64, act=_lrelu, **ax)(e, training)
            x2 = jnp.max(e, axis=2)

            e = edge_features(x2, self.k)
            e = DenseBNAct(64, act=_lrelu, **ax)(e, training)
            x3 = jnp.max(e, axis=2)

        x = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 192]
        x = DenseBNAct(1024, act=_lrelu, **ax)(x, training)
        g = jnp.max(x, axis=1)  # [B, 1024]

        l = DenseBNAct(64, act=_lrelu, **ax)(
            cls_label.astype(xyz.dtype), training)  # [B, 64]
        g = jnp.concatenate([g, l], axis=-1)  # [B, 1088]
        g = jnp.broadcast_to(g[:, None, :], (b, n, g.shape[-1]))

        h = jnp.concatenate([g, x1, x2, x3], axis=-1)  # [B, N, 1280]
        h = DenseBNAct(256, act=_lrelu, **ax)(h, training)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        h = DenseBNAct(256, act=_lrelu, **ax)(h, training)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        h = DenseBNAct(128, act=_lrelu, **ax)(h, training)
        return nn.Dense(self.part_num, use_bias=False,
                        kernel_init=reference_linear_init)(h)
