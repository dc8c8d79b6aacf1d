"""KPCNN — kernel-point CNN for classification, dense/batched/masked.

Reference: networks/cls/kpconv.py:48-178 (network walker),
networks/cls/blocks.py:125-638 (KPConv layer + block zoo),
datasets/ModelNet40.py:1300-1427 (Modelnet40Config hyperparameters).

TPU-first redesign decisions:
* ragged stacked tensors → dense ``[B, N_l, C]`` + masks (Pyramid);
* the shadow-point convention (blocks.py:258 appends a 1e6 row) →
  explicit neighbor masks: invalid slots contribute zero influence and
  zero features;
* the deformable path's dynamic in-range re-gather (blocks.py:283-303)
  is a GPU memory optimization with data-dependent shapes — on TPU we
  compute the full static neighborhood (the math is identical);
* the convolution core is two einsums (influence × features, then
  per-kernel-point weights), which XLA fuses onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudlib_tpu.models.kpconv.kernel_points import load_kernels
from pointcloudlib_tpu.nn.layers import reference_linear_init
from pointcloudlib_tpu.models.kpconv.pyramid import Pyramid, build_pyramid

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class KPConvConfig:
    """Modelnet40Config equivalents (datasets/ModelNet40.py:1300-1427)."""

    num_classes: int = 40
    architecture: Tuple[str, ...] = (
        "simple",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
        "resnetb_strided",
        "resnetb",
        "resnetb",
        "global_average",
    )
    num_kernel_points: int = 15
    first_subsampling_dl: float = 0.02
    conv_radius: float = 2.5
    deform_radius: float = 6.0
    kp_extent: float = 1.2
    kp_influence: str = "linear"          # constant | linear | gaussian
    aggregation_mode: str = "sum"         # sum | closest
    in_features_dim: int = 1
    first_features_dim: int = 64
    modulated: bool = True
    use_batch_norm: bool = True
    batch_norm_momentum: float = 0.95     # flax convention of torch 0.05
    # neighborhood widths per layer (reference neighborhood_limits,
    # kpconv_loader.py:705; recompute for your data with
    # calibrate.calibrate_pyramid — the CLI does)
    neighborhood_limits: Tuple[int, ...] = (22, 35, 41, 42, 37)
    # static per-layer point caps; None → the n/4^l heuristic
    # (pyramid.pyramid_shapes). calibrate_pyramid derives these from
    # observed voxel occupancy so grid_subsample never truncates.
    caps: Optional[Tuple[int, ...]] = None
    deform_fitting_power: float = 1.0
    repulse_extent: float = 1.2
    # shard_map DP: psum the BN statistics over this mesh axis
    # (sync-BN, like nn/layers.py's axis_name) — None = single shard
    axis_name: Optional[str] = None


def _masked_moments(x: Array, mask: Array, axis_name=None):
    """Mean/var over valid points only (mask [..., 1] broadcastable).
    ``axis_name``: psum the masked sums over the mesh axis first —
    sync-BN; shards carry different valid counts, so the SUMS are
    reduced, never per-shard moments."""
    w = mask.astype(x.dtype)
    cnt = jnp.sum(w)
    sx = jnp.sum(x * w, axis=tuple(range(x.ndim - 1)))
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
        sx = jax.lax.psum(sx, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = sx / cnt
    sv = jnp.sum(w * (x - mean) ** 2, axis=tuple(range(x.ndim - 1)))
    if axis_name is not None:
        sv = jax.lax.psum(sv, axis_name)
    var = sv / cnt
    return mean, var


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose statistics ignore padded points.

    The reference's stacked ragged format has no padding so plain BN
    works there (BatchNormBlock, blocks.py:404-435); dense padded
    batches need the mask-aware version or pad rows pollute the stats.
    Falls back to a learned bias when ``use_bn=False`` like the
    reference.
    """

    use_bn: bool = True
    momentum: float = 0.95
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array, training: bool) -> Array:
        c = x.shape[-1]
        if not self.use_bn:
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return x + bias
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if training:
            mean, var = _masked_moments(x, mask[..., None],
                                        self.axis_name)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return y


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class UnaryBlock(nn.Module):
    """Linear (no bias) + BN + LeakyReLU(0.1) (blocks.py:443-478)."""

    out_dim: int
    use_bn: bool = True
    momentum: float = 0.95
    no_relu: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, mask: Array, training: bool) -> Array:
        x = nn.Dense(self.out_dim, use_bias=False,
                     kernel_init=reference_linear_init)(x)
        x = MaskedBatchNorm(self.use_bn, self.momentum,
                            self.axis_name)(x, mask, training)
        return x if self.no_relu else _lrelu(x)


class KPConvOp(nn.Module):
    """The kernel-point convolution (blocks.py:125-359), dense/batched.

    ``q [B,M,3]``, ``s [B,N,3]``, ``feats [B,N,C]``, ``idx [B,M,K]``
    (shadow sentinel N allowed), ``nmask [B,M,K]`` → ``[B,M,out_dim]``.
    """

    out_dim: int
    radius: float           # kernel-point layout radius
    kp_extent: float        # influence extent (already layer-scaled)
    num_kpoints: int = 15
    influence: str = "linear"
    aggregation: str = "sum"
    deformable: bool = False
    modulated: bool = False
    fitting_power: float = 1.0   # deform_fitting_power (config knob)
    repulse_extent: float = 1.2  # Modelnet40Config (ModelNet40.py:1383)

    @nn.compact
    def __call__(
        self,
        q: Array,
        s: Array,
        feats: Array,
        idx: Array,
        nmask: Array,
        training: bool = False,
    ) -> Array:
        # deterministic per (radius, K) → embedded as a trace-time
        # constant, mirroring the reference's stop_grad buffer
        # (blocks.py:210-220)
        kp = jnp.asarray(
            load_kernels(self.radius, self.num_kpoints), jnp.float32
        )  # [P, 3]
        p = self.num_kpoints
        c_in = feats.shape[-1]

        from pointcloudlib_tpu.ops import index_points

        n = s.shape[1]
        safe = jnp.minimum(idx, n - 1)
        # ONE combined [coords ‖ feats] gather: index_points routes to
        # the Pallas gather-as-matmul on TPU (the slowest op here), and
        # its one-hot matmul pads the row width to full MXU lanes — so
        # the 3-wide coordinate gather costs as much as the feature
        # gather; fusing them halves the gather cost per conv
        g = index_points(jnp.concatenate([s, feats], axis=-1), safe)
        # stop_gradient: coordinates have no trainable upstream (the
        # pyramid is geometry) — without it the shared gather would
        # revive the dead d2→coords cotangent chain that jax prunes
        # when the gathers are separate (deformable offsets still get
        # their gradient through kpts, not nbr)
        nbr = jax.lax.stop_gradient(g[..., :3]) - q[:, :, None, :]
        nfeat = jnp.where(nmask[..., None], g[..., 3:], 0.0)

        if self.deformable:
            # offsets predicted by a rigid KPConv over the same
            # neighborhood (blocks.py:169-186,225-251)
            off_dim = (3 + 1) * p if self.modulated else 3 * p
            raw = KPConvOp(
                out_dim=off_dim,
                radius=self.radius,
                kp_extent=self.kp_extent,
                num_kpoints=p,
                influence=self.influence,
                aggregation=self.aggregation,
                name="offset_conv",
            )(q, s, feats, idx, nmask, training)
            raw = raw + self.param(
                "offset_bias", nn.initializers.zeros, (off_dim,)
            )
            offsets = raw[..., : 3 * p].reshape(*q.shape[:2], p, 3)
            offsets = offsets * self.kp_extent
            kpts = kp + offsets  # [B,M,P,3]
            modul = (
                2.0 * nn.sigmoid(raw[..., 3 * p :])
                if self.modulated
                else None
            )
            d2 = jnp.sum(
                (nbr[:, :, :, None, :] - kpts[:, :, None, :, :]) ** 2,
                axis=-1,
            )  # [B,M,K,P]
            # fitting + repulsive regularizer contribution of this conv
            # (p2p_fitting_regularizer, networks/cls/kpconv.py:12-45),
            # sown as a scalar the trainer sums generically
            min_d2 = jnp.min(
                jnp.where(nmask[..., None], d2, jnp.inf), axis=2
            )
            # average over REAL query rows only: the reference's
            # stacked representation has no padding rows at all
            # (kpconv.py:26-29 means over real points), so including
            # ours would scale the regularizer by the occupancy
            # fraction and feed offset gradients from padding
            valid_q = jnp.any(nmask, axis=2)  # [B, M]
            nvalid = jnp.maximum(jnp.sum(valid_q.astype(jnp.float32)),
                                 1.0)
            fitting = jnp.sum(
                jnp.where(jnp.isfinite(min_d2), min_d2, 0.0)
                * valid_q[..., None]
            ) / (nvalid * p) / (self.kp_extent**2)
            locs = kpts / self.kp_extent
            pd = jnp.sqrt(
                jnp.sum(
                    (locs[..., :, None, :] - locs[..., None, :, :]) ** 2,
                    -1,
                )
                + 1e-12
            )
            off_diag = 1.0 - jnp.eye(p)
            rep = (
                jnp.clip(pd - self.repulse_extent, max=0.0) ** 2
                * off_diag
            )
            # reference: sum over kernel points i of mean-over-points of
            # Σ_j≠i, divided by K (kpconv.py:36-43) — the kernel-point
            # axis is SUMMED, not averaged
            repulsive = jnp.sum(
                jnp.sum(rep, axis=(-2, -1)) * valid_q
            ) / nvalid / p
            self.sow(
                "intermediates", "reg_loss",
                self.fitting_power * (2.0 * fitting + repulsive),
            )
        else:
            d2 = jnp.sum(
                (nbr[:, :, :, None, :] - kp[None, None, None]) ** 2, axis=-1
            )  # [B,M,K,P]
            modul = None

        if self.influence == "constant":
            infl = jnp.ones_like(d2)
        elif self.influence == "linear":
            # eps inside the sqrt: its gradient at 0 is inf, and in the
            # deformable path d2 is a function of the offset params
            infl = jnp.maximum(
                1.0 - jnp.sqrt(d2 + 1e-12) / self.kp_extent, 0.0
            )
        elif self.influence == "gaussian":
            sigma = self.kp_extent * 0.3
            infl = jnp.exp(-d2 / (2 * sigma * sigma))
        else:
            raise ValueError(self.influence)
        if self.aggregation == "closest":
            closest = jnp.argmin(d2, axis=-1)
            infl = infl * jax.nn.one_hot(closest, p, dtype=infl.dtype)
        elif self.aggregation != "sum":
            raise ValueError(self.aggregation)
        infl = jnp.where(nmask[..., None], infl, 0.0)

        # (influence × neighbor features) then per-kernel-point weights —
        # the reference's matmul chain (blocks.py:335-355) as two einsums
        weighted = jnp.einsum(
            "bmkp,bmkc->bmpc", infl, nfeat,
            preferred_element_type=jnp.float32,
        )
        if modul is not None:
            weighted = weighted * modul[..., None]
        w = self.param(
            "weights",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (p, c_in, self.out_dim),
        )
        return jnp.einsum(
            "bmpc,pcd->bmd", weighted, w,
            preferred_element_type=jnp.float32,
        )


def _pool_max(feats: Array, idx: Array, nmask: Array) -> Array:
    """Masked max over pooled neighbors (reference max_pool,
    blocks.py:76-90); all-invalid rows yield 0."""
    from pointcloudlib_tpu.ops import index_points

    n = feats.shape[1]
    safe = jnp.minimum(idx, n - 1)
    g = index_points(feats, safe)
    g = jnp.where(nmask[..., None], g, -jnp.inf)
    out = jnp.max(g, axis=2)
    return jnp.where(jnp.isfinite(out), out, 0.0)


class SimpleBlock(nn.Module):
    """KPConv(out/2) + BN + LeakyReLU (blocks.py:481-535)."""

    out_dim: int
    radius: float
    kp_extent: float
    cfg: KPConvConfig
    strided: bool = False
    deformable: bool = False

    @nn.compact
    def __call__(self, x, pyr: Pyramid, layer: int, training: bool):
        if self.strided:
            q, qm = pyr.points[layer + 1], pyr.masks[layer + 1]
            idx, nm = pyr.pools[layer], pyr.pool_masks[layer]
        else:
            q, qm = pyr.points[layer], pyr.masks[layer]
            idx, nm = pyr.neighbors[layer], pyr.neighbor_masks[layer]
        s = pyr.points[layer]
        h = KPConvOp(
            out_dim=self.out_dim // 2,
            radius=self.radius,
            kp_extent=self.kp_extent,
            num_kpoints=self.cfg.num_kernel_points,
            influence=self.cfg.kp_influence,
            aggregation=self.cfg.aggregation_mode,
            deformable=self.deformable,
            modulated=self.cfg.modulated and self.deformable,
            fitting_power=self.cfg.deform_fitting_power,
            repulse_extent=self.cfg.repulse_extent,
        )(q, s, x, idx, nm, training)
        h = MaskedBatchNorm(
            self.cfg.use_batch_norm, self.cfg.batch_norm_momentum,
            self.cfg.axis_name,
        )(h, qm, training)
        return _lrelu(h)


class ResnetBottleneckBlock(nn.Module):
    """unary(out/4) → KPConv(out/4) → unary(out) + shortcut
    (blocks.py:538-623)."""

    in_dim: int
    out_dim: int
    radius: float
    kp_extent: float
    cfg: KPConvConfig
    strided: bool = False
    deformable: bool = False

    @nn.compact
    def __call__(self, x, pyr: Pyramid, layer: int, training: bool):
        cfg = self.cfg
        if self.strided:
            q, qm = pyr.points[layer + 1], pyr.masks[layer + 1]
            idx, nm = pyr.pools[layer], pyr.pool_masks[layer]
        else:
            q, qm = pyr.points[layer], pyr.masks[layer]
            idx, nm = pyr.neighbors[layer], pyr.neighbor_masks[layer]
        s = pyr.points[layer]
        sm = pyr.masks[layer]

        h = x
        if self.in_dim != self.out_dim // 4:
            h = UnaryBlock(
                self.out_dim // 4, cfg.use_batch_norm,
                cfg.batch_norm_momentum, axis_name=cfg.axis_name,
            )(h, sm, training)
        h = KPConvOp(
            out_dim=self.out_dim // 4,
            radius=self.radius,
            kp_extent=self.kp_extent,
            num_kpoints=cfg.num_kernel_points,
            influence=cfg.kp_influence,
            aggregation=cfg.aggregation_mode,
            deformable=self.deformable,
            modulated=cfg.modulated and self.deformable,
            fitting_power=cfg.deform_fitting_power,
            repulse_extent=cfg.repulse_extent,
        )(q, s, h, idx, nm, training)
        h = MaskedBatchNorm(
            cfg.use_batch_norm, cfg.batch_norm_momentum, cfg.axis_name
        )(h, qm, training)
        h = _lrelu(h)
        h = UnaryBlock(
            self.out_dim, cfg.use_batch_norm, cfg.batch_norm_momentum,
            no_relu=True, axis_name=cfg.axis_name,
        )(h, qm, training)

        shortcut = _pool_max(x, idx, nm) if self.strided else x
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(
                self.out_dim, cfg.use_batch_norm, cfg.batch_norm_momentum,
                no_relu=True, axis_name=cfg.axis_name,
            )(shortcut, qm, training)
        return _lrelu(h + shortcut)


class KPCNN(nn.Module):
    """Architecture-string walker (networks/cls/kpconv.py:72-110)."""

    cfg: KPConvConfig = KPConvConfig()

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        mask: Optional[Array] = None,
        training: bool = False,
        subsample_input: bool = True,
    ) -> Array:
        cfg = self.cfg
        if mask is None:
            mask = jnp.ones(xyz.shape[:2], bool)
        pyr = build_pyramid(
            xyz, mask, cfg.first_subsampling_dl, cfg.conv_radius,
            cfg.deform_radius, cfg.architecture, cfg.neighborhood_limits,
            subsample_input=subsample_input, caps=cfg.caps,
        )
        if pyr.overflow is not None:
            # truncated-voxel count across the batch/levels: 0 when the
            # calibrated caps are lossless; surfaced by the trainer so a
            # mis-calibrated cap shows up in one epoch, not as silent
            # accuracy drift (VERDICT r2 #9)
            self.sow(
                "intermediates", "voxel_overflow",
                jnp.sum(pyr.overflow.astype(jnp.float32)),
            )

        x = jnp.ones(
            (*pyr.points[0].shape[:2], cfg.in_features_dim), jnp.float32
        )
        x = x * pyr.masks[0][..., None]

        r = cfg.first_subsampling_dl * cfg.conv_radius
        in_dim = cfg.in_features_dim
        out_dim = cfg.first_features_dim
        layer = 0
        for block in cfg.architecture:
            if "global" in block or "upsample" in block:
                break
            extent = r * cfg.kp_extent / cfg.conv_radius
            strided = "strided" in block
            deformable = "deformable" in block
            if "simple" in block:
                x = SimpleBlock(
                    out_dim, r, extent, cfg, strided=strided,
                    deformable=deformable,
                )(x, pyr, layer, training)
                in_dim = out_dim // 2
            elif "resnetb" in block:
                x = ResnetBottleneckBlock(
                    in_dim, out_dim, r, extent, cfg, strided=strided,
                    deformable=deformable,
                )(x, pyr, layer, training)
                in_dim = out_dim
            elif block == "unary":
                x = UnaryBlock(
                    out_dim, cfg.use_batch_norm, cfg.batch_norm_momentum,
                    axis_name=cfg.axis_name,
                )(x, pyr.masks[layer], training)
                in_dim = out_dim
            else:
                raise ValueError(f"unknown block {block!r}")
            if strided:
                layer += 1
                r *= 2
                out_dim *= 2

        # global average over valid points (blocks.py:626-638)
        m = pyr.masks[layer][..., None].astype(x.dtype)
        g = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)

        bmask = jnp.ones((g.shape[0],), bool)
        g = UnaryBlock(1024, use_bn=False)(g, bmask, training)
        return UnaryBlock(cfg.num_classes, use_bn=False, no_relu=True)(
            g, bmask, training
        )


def sum_overflow(intermediates) -> Optional[Array]:
    """Total truncated-voxel count sown by KPCNN pyramids this step, or
    None when no module sowed one (non-KPConv models)."""
    total = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(intermediates):
        if "voxel_overflow" in str(path):
            total = jnp.sum(leaf) if total is None else total + jnp.sum(leaf)
    return total


def sum_reg_losses(intermediates) -> Array:
    """Total deformable-KPConv regularizer: sum of every ``reg_loss``
    scalar sown by deformable KPConvOp layers (the per-module collection
    replaces the reference's net.modules() walk, kpconv.py:16-18)."""
    total = jnp.zeros(())
    for path, leaf in jax.tree_util.tree_leaves_with_path(intermediates):
        if "reg_loss" in str(path):
            total = total + jnp.sum(leaf)
    return total
