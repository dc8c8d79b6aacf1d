"""Shared NN building blocks, channel-last, flax.linen.

The reference's 1x1 Conv1d/Conv2d stacks (misc/layers.py:208-270, the
build_mlps helper networks/cls/pointnet2.py:18-31) are all pointwise
convolutions — on TPU those are Dense layers over the trailing feature
axis, which XLA maps straight onto the MXU with the feature dim in lanes.

BatchNorm: the reference uses torch-convention momentum 0.1 (new stats
weighted 0.1); flax's convention is the complement, so ``momentum=0.9``
here reproduces it. KPConv uses 0.05 → 0.95 (datasets/ModelNet40.py:1375).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloudlib_tpu.ops import (
    ball_query,
    fps,
    group_all,
    group_points,
    index_points,
    three_nn_interpolate,
)

Array = jax.Array

# Reference-matched linear init: the torch/jittor nn.Conv / nn.Linear
# default is kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)), whose
# squared norm is 3x SMALLER than flax's lecun_normal default. Nearly
# every linear here feeds a BatchNorm, and under BN the forward pass is
# invariant to the weight's scale — with the reference's SGD+momentum
# the effective learning rate on the weight's direction goes as
# lr/||w||^2, so the init scale IS a training hyperparameter and must
# match the reference. Measured effect is modest in isolation
# (pointconv-seg 10-epoch probe: 7.55 -> 8.22 IoU,
# scripts/probe_pointconv_seg_torchinit.py) — kept for parity, not as
# the convergence-gap fix; gradient parity at EQUAL weights is exact
# on CPU (scripts/probe_pointconv_seg_gradparity.py, ratios <= 1.02).
reference_linear_init = (
    nn.initializers.lecun_normal()
    if os.environ.get("POINTCLOUDLIB_REF_INIT", "1") == "0"
    else nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
)


def compute_dtype():
    """Matmul compute dtype: bf16 on TPU (MXU native, f32 accumulate via
    preferred_element_type), f32 elsewhere. Override with
    ``POINTCLOUDLIB_DTYPE=float32|bfloat16``. BatchNorm statistics and
    parameters always stay f32.
    """
    import os

    forced = os.environ.get("POINTCLOUDLIB_DTYPE")
    if forced == "float32":
        return jnp.float32
    if forced == "bfloat16":
        return jnp.bfloat16
    try:
        return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    except Exception:
        return jnp.float32


class DenseBNAct(nn.Module):
    """Dense → BatchNorm → activation, the pervasive pointwise block.

    ``axis_name``: set when training inside shard_map data parallelism
    so BatchNorm syncs its batch statistics across the axis (jit-SPMD
    syncs implicitly; shard_map needs the explicit collective)."""

    features: int
    use_bn: bool = True
    act: Optional[Callable[[Array], Array]] = nn.relu
    bn_momentum: float = 0.9
    use_bias: Optional[bool] = None  # default: bias iff no BN
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        x = nn.Dense(self.features, use_bias=bias, dtype=compute_dtype(),
                     kernel_init=reference_linear_init)(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=self.bn_momentum,
                epsilon=1e-5,
                dtype=jnp.float32,  # stats and normalization in f32
                axis_name=self.axis_name,
            )(x)
        x = x.astype(jnp.float32)
        if self.act is not None:
            x = self.act(x)
        # NOTE: measured on v5e — storing activations in bf16 between
        # layers REGRESSES throughput ~16% (re-layout/fusion penalty
        # outweighs the halved HBM traffic); matmuls are bf16 via the
        # Dense dtype, stores stay f32.
        return x


class PointMLP(nn.Module):
    """Stack of DenseBNAct blocks applied over the trailing channel axis.

    Works on any rank: ``[B, N, C]`` or grouped ``[B, M, K, C]``.
    Equivalent of the reference's build_mlps (networks/cls/pointnet2.py:18).
    """

    features: Sequence[int]
    use_bn: bool = True
    act: Callable[[Array], Array] = nn.relu
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        for f in self.features:
            x = DenseBNAct(
                f, use_bn=self.use_bn, act=self.act,
                bn_momentum=self.bn_momentum, axis_name=self.axis_name,
            )(x, training)
        return x


def _fused_sa_enabled() -> bool:
    """The fused SA Pallas path runs by default on TPU (the compiled
    kernels); ``POINTCLOUDLIB_FUSED_SA=1|0`` forces it on/off (on CPU it
    runs in interpret mode — correct but slow, tests only)."""
    import os

    forced = os.environ.get("POINTCLOUDLIB_FUSED_SA")
    if forced == "1":
        return True
    if forced == "0":
        return False
    from pointcloudlib_tpu.ops.dispatch import USE_PALLAS

    return USE_PALLAS


def _bq_kmax() -> int:
    """Largest n_samples the in-kernel ball-query fused SA takes
    (FusedSetAbstraction fuse_bq gate). Read at trace time — A/B flips
    must use fresh processes (CLAUDE.md round-2b gate-cache lesson).
    k=128 measured LOSING at step level (bench msg 644.5 -> 614.7
    sa/s): the bq kernel's slot-outer [b,k,m,c] layout pays an XLA
    transpose of the 268 MB h1 per k=128 scale."""
    import os

    return int(os.environ.get("POINTCLOUDLIB_BQ_KMAX", "64"))


def _bq_nmax() -> int:
    """Largest source-cloud N the in-kernel ball-query fused SA takes.
    The r4 pass profile has bqf1 ~2x the separate ball_query+f1 cost
    at N=2048 (9.8 vs ~5 ms net, partseg SA1 shape) — the bq kernel's
    per-slot [mt, N] rank extraction scales with N while f1's one-hot
    chunks amortize. Trace-time env read (fresh process per A/B arm)."""
    import os

    return int(os.environ.get("POINTCLOUDLIB_BQ_NMAX", "99999"))


class SetAbstraction(nn.Module):
    """PointNet++ single-scale set-abstraction layer.

    FPS → ball query → group (recentred xyz ++ features) → shared MLP →
    max-pool over the neighbor axis. ``n_points=None`` is the group-all
    final layer. Mirrors PointnetModule (networks/cls/pointnet2.py:65-80)
    with the per-group max of pointnet2.py:57.

    On TPU, grouped 3-layer instances dispatch to the fully-fused Pallas
    path (FusedSetAbstraction). The two paths declare different
    parameter trees; utils/interop.convert_variables re-shapes a
    checkpoint between them (tests/test_interop_fused.py).
    """

    mlp: Sequence[int]
    n_points: Optional[int] = None
    radius: Optional[float] = None
    n_samples: Optional[int] = None
    use_xyz: bool = True
    axis_name: Optional[str] = None   # shard_map DP: sync-BN
    world: int = 1

    @nn.compact
    def __call__(
        self, xyz: Array, feats: Optional[Array], training: bool = False
    ) -> Tuple[Array, Array]:
        if (
            self.n_points is not None
            and len(self.mlp) == 3
            and self.n_samples is not None
            and self.n_samples % 8 == 0
            and _fused_sa_enabled()
        ):
            return FusedSetAbstraction(
                mlp=tuple(self.mlp), n_points=self.n_points,
                radius=self.radius, n_samples=self.n_samples,
                use_xyz=self.use_xyz, axis_name=self.axis_name,
                world=self.world,
            )(xyz, feats, training)
        if self.n_points is None:
            grouped = group_all(xyz, feats, use_xyz=self.use_xyz)  # [B,1,N,C]
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        else:
            idx = fps(xyz, self.n_points)
            new_xyz = index_points(xyz, idx)
            nidx, _ = ball_query(new_xyz, xyz, self.radius, self.n_samples)
            grouped = group_points(xyz, feats, new_xyz, nidx, self.use_xyz)
        h = PointMLP(self.mlp, axis_name=self.axis_name)(grouped, training)
        return new_xyz, jnp.max(h, axis=2)


class FusedSetAbstraction(nn.Module):
    """Fully-fused SA layer: the gather→Dense→BN→ReLU×3→max chain runs
    in VMEM (ops/pallas/fused_sa.py). Numerically matches the unfused
    path to bf16-checkpoint precision (~1e-2 relative); BN semantics
    (batch statistics over every grouped row, running-average update)
    are identical.
    """

    mlp: Sequence[int]                  # exactly 3 widths
    n_points: int = 512
    radius: float = 0.2
    n_samples: int = 64
    use_xyz: bool = True
    bn_momentum: float = 0.9
    # set when running inside shard_map data parallelism: BN statistics
    # are psum'd over the axis (sync-BN, tests/test_fused_sa_dp.py)
    axis_name: Optional[str] = None
    world: int = 1

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        feats: Optional[Array],
        training: bool = False,
        *,
        new_xyz: Optional[Array] = None,
        nidx: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """``new_xyz``/``nidx`` may be precomputed by the caller (MSG
        shares one FPS across scales)."""
        from pointcloudlib_tpu.ops.pallas.fused_sa import (
            SAParams,
            SAStats,
            _window_width,
            fused_sa_bq_eval,
            fused_sa_bq_train,
            fused_sa_eval,
            fused_sa_train,
        )

        c1, c2, c3 = self.mlp
        interpret = jax.default_backend() != "tpu"

        if new_xyz is None:
            idx = fps(xyz, self.n_points)
            new_xyz = index_points(xyz, idx)
        # ball query fused into the gather kernel (the rank-extraction
        # mask IS the one-hot row) unless the caller precomputed nidx
        # or the windowed path (N >= 4096) takes over
        n = xyz.shape[1]
        # k <= 64 by default: beyond that the per-slot [mt,N]x[N,C]
        # matmuls were measured losing to the chunked [cm*k,N] one-hot
        # at MSG's k=128 scale — but that A/B predates surface-cloud
        # profiles (max(cnt)≈66 there, and the bq kernel's slot loop
        # is bounded by max(cnt), not k). POINTCLOUDLIB_BQ_KMAX
        # re-opens the gate for on-chip A/Bs.
        fuse_bq = (nidx is None and _window_width(n) is None
                   and n % 128 == 0 and n <= _bq_nmax()
                   and self.n_samples <= _bq_kmax())
        ncnt = None
        if not fuse_bq:
            if nidx is None:
                # cnt feeds the slot-capped fused passes (fused_sa.py
                # _kc_variants): padding-replica slots are accounted
                # for analytically when max(cnt) allows
                nidx, ncnt = ball_query(new_xyz, xyz, self.radius,
                                        self.n_samples)
                ncnt = jax.lax.stop_gradient(ncnt)
            nidx = jax.lax.stop_gradient(nidx)

        if feats is None:
            p, recenter = xyz, 3
        elif self.use_xyz:
            p, recenter = jnp.concatenate([xyz, feats], axis=-1), 3
        else:
            p, recenter = feats, 0
        c0 = p.shape[-1]
        w1 = self.param(
            "w1", reference_linear_init, (c0, c1), jnp.float32
        )
        # match nn.Dense(dtype=bf16): bf16 operands, f32 accumulation
        q = jnp.dot(
            p.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        if recenter:
            off = jnp.dot(
                new_xyz.astype(jnp.bfloat16),
                w1[:recenter].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            off = jnp.zeros((*new_xyz.shape[:2], c1), jnp.float32)

        def bn_param(name, c, init):
            return self.param(name, init, (c,), jnp.float32)

        params = SAParams(
            w2=self.param("w2", reference_linear_init, (c1, c2),
                          jnp.float32),
            w3=self.param("w3", reference_linear_init, (c2, c3),
                          jnp.float32),
            g1=bn_param("bn1_scale", c1, nn.initializers.ones),
            b1=bn_param("bn1_bias", c1, nn.initializers.zeros),
            g2=bn_param("bn2_scale", c2, nn.initializers.ones),
            b2=bn_param("bn2_bias", c2, nn.initializers.zeros),
            g3=bn_param("bn3_scale", c3, nn.initializers.ones),
            b3=bn_param("bn3_bias", c3, nn.initializers.zeros),
        )
        ra = [
            (
                self.variable("batch_stats", f"mean{l}",
                              lambda c=c: jnp.zeros((c,), jnp.float32)),
                self.variable("batch_stats", f"var{l}",
                              lambda c=c: jnp.ones((c,), jnp.float32)),
            )
            for l, c in ((1, c1), (2, c2), (3, c3))
        ]

        if training:
            if fuse_bq:
                out, stats = fused_sa_bq_train(
                    jax.lax.stop_gradient(new_xyz),
                    jax.lax.stop_gradient(xyz), q, off, params,
                    self.radius, self.n_samples, interpret,
                    self.axis_name, self.world)
            else:
                out, stats = fused_sa_train(
                    q, off, nidx, params, interpret, self.axis_name,
                    self.world, ncnt)
            if not self.is_initializing():
                mom = self.bn_momentum
                batch = [(stats.m1, stats.v1), (stats.m2, stats.v2),
                         (stats.m3, stats.v3)]
                for (rm, rv), (bm, bv) in zip(ra, batch):
                    rm.value = mom * rm.value + (1 - mom) * bm
                    rv.value = mom * rv.value + (1 - mom) * bv
        else:
            running = SAStats(
                m1=ra[0][0].value, v1=ra[0][1].value,
                m2=ra[1][0].value, v2=ra[1][1].value,
                m3=ra[2][0].value, v3=ra[2][1].value,
            )
            if fuse_bq:
                out = fused_sa_bq_eval(
                    new_xyz, xyz, q, off, params, running, self.radius,
                    self.n_samples, interpret=interpret)
            else:
                out = fused_sa_eval(q, off, nidx, params, running,
                                    interpret=interpret, cnt=ncnt)
        return new_xyz, out


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping SA layer (PointnetModuleMSG,
    networks/cls/pointnet2.py:84-98): one FPS, several radii, features
    concatenated across scales."""

    n_points: int
    radii: Sequence[float]
    n_samples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    axis_name: Optional[str] = None   # shard_map DP: sync-BN
    world: int = 1

    @nn.compact
    def __call__(
        self, xyz: Array, feats: Optional[Array], training: bool = False
    ) -> Tuple[Array, Array]:
        idx = fps(xyz, self.n_points)
        new_xyz = index_points(xyz, idx)
        fuse = (
            all(len(m) == 3 for m in self.mlps)
            and all(k % 8 == 0 for k in self.n_samples)
            and _fused_sa_enabled()
        )
        outs = []
        for r, k, mlp in zip(self.radii, self.n_samples, self.mlps):
            if fuse:
                # nidx=None lets the layer build the ball query inside
                # its gather kernel (fused_sa_bq_*) when eligible
                _, h = FusedSetAbstraction(
                    mlp=tuple(mlp), n_points=self.n_points, radius=r,
                    n_samples=k, use_xyz=self.use_xyz,
                    axis_name=self.axis_name, world=self.world,
                )(xyz, feats, training, new_xyz=new_xyz, nidx=None)
                outs.append(h)
                continue
            nidx, _ = ball_query(new_xyz, xyz, r, k)
            grouped = group_points(xyz, feats, new_xyz, nidx,
                                   self.use_xyz)
            h = PointMLP(mlp, axis_name=self.axis_name)(grouped, training)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """PointNet++ feature-propagation (decoder) layer.

    3-NN inverse-distance interpolation of coarse features up to the fine
    point set, skip-concat, shared MLP (reference misc/ops.py:54-107).
    """

    mlp: Sequence[int]
    axis_name: Optional[str] = None   # shard_map DP: sync-BN

    @nn.compact
    def __call__(
        self,
        xyz_fine: Array,
        xyz_coarse: Array,
        feats_fine: Optional[Array],
        feats_coarse: Array,
        training: bool = False,
    ) -> Array:
        if xyz_coarse.shape[1] == 1:
            # single coarse point: broadcast (reference misc/ops.py:78-84)
            up = jnp.broadcast_to(
                feats_coarse,
                (xyz_fine.shape[0], xyz_fine.shape[1], feats_coarse.shape[-1]),
            )
        else:
            up = three_nn_interpolate(xyz_fine, xyz_coarse, feats_coarse)
        if feats_fine is not None:
            up = jnp.concatenate([feats_fine, up], axis=-1)
        return PointMLP(self.mlp, axis_name=self.axis_name)(up, training)
