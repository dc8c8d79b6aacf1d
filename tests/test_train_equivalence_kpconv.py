"""Cross-framework TRAINING equivalence for KPConv.

An independent torch implementation of the reference's KPCNN math —
per-cloud stacked/shadow-row KPConv (blocks.py:125-359), plain BN over
valid points (blocks.py:404-435), max-pool shortcuts (blocks.py:76-90),
the 15-block architecture walk (kpconv.py:72-110) — consumes the SAME
pyramid and the SAME weights as our dense/masked KPCNN, and both train
several steps with the KPConv optimizer recipe structure (grad-clip
100 + SGD momentum 0.98, datasets/ModelNet40.py:1392-1402). Everything
is f32 on both sides, so unlike the fused-SA case the loss trajectory,
parameters, and BN running stats must agree tightly.

The torch side reads our parameter tree (same values, its own stacked
formulation) and keeps its own running-stat dict; the pyramid is built
once by models/kpconv/pyramid.build_pyramid and fed to both sides —
pyramid parity itself is covered by tests/test_pyramid_parity.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models.kpconv.kernel_points import (  # noqa: E402
    load_kernels,
)
from pointcloudlib_tpu.models.kpconv.model import (  # noqa: E402
    KPCNN,
    KPConvConfig,
)
from pointcloudlib_tpu.models.kpconv.pyramid import (  # noqa: E402
    build_pyramid,
)

B, N, STEPS = 2, 200, 5
LR, MOM, CLIP, EPS = 1e-3, 0.98, 100.0, 0.2


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _soft_ce(logits, labels, n_class):
    one_hot = torch.nn.functional.one_hot(labels, n_class).float()
    soft = one_hot * (1 - EPS) + (1 - one_hot) * (EPS / (n_class - 1))
    logp = torch.nn.functional.log_softmax(logits, dim=-1)
    return -(soft * logp).sum(-1).mean()


def _torch_kpconv(q, s, x, idx, kp, w, extent):
    """Reference stacked formulation, one cloud (blocks.py:255-355)."""
    s_pad = torch.cat([s, torch.full((1, 3), 1e6)], 0)
    nbr = s_pad[idx] - q[:, None, :]                    # [M, K, 3]
    diff = nbr[:, :, None, :] - kp[None, None]          # [M, K, P, 3]
    d2 = (diff ** 2).sum(-1)
    infl = torch.clamp(1 - torch.sqrt(d2 + 1e-12) / extent, min=0.0)
    infl = infl.transpose(1, 2)                         # [M, P, K]
    x_pad = torch.cat([x, torch.zeros(1, x.shape[-1])], 0)
    nx = x_pad[idx]                                     # [M, K, C]
    wf = torch.matmul(infl, nx)                         # [M, P, C]
    return torch.einsum("mpc,pcd->md", wf, w)


class _TorchKPCNN:
    """Functional torch walker over our parameter tree (same values,
    independent math). Maintains its own BN running-stat dict with
    torch conventions (momentum 0.05, unbiased running var)."""

    def __init__(self, params, cfg: KPConvConfig, kp):
        self.p = jax.tree_util.tree_map(
            lambda x: _t(np.asarray(x)).clone().requires_grad_(True),
            dict(params))
        self.cfg = cfg
        self.kp = _t(kp)
        self.stats = {}

    def leaves(self):
        return jax.tree_util.tree_leaves(self.p)

    def _bn(self, x, mask, path, training):
        """Plain BN over valid points (the reference's stacked tensors
        have no padding), mask-packed here."""
        scale, bias = path["scale"], path["bias"]
        key = id(path)
        if key not in self.stats:
            c = scale.shape[0]
            self.stats[key] = [torch.zeros(c), torch.ones(c)]
        rm, rv = self.stats[key]
        if training:
            flat = x[mask]                              # [nv, C]
            mean = flat.mean(0)
            var = ((flat - mean) ** 2).mean(0)
            nv = flat.shape[0]
            with torch.no_grad():
                ub = var.detach() * nv / max(nv - 1, 1)
                self.stats[key][0] = 0.95 * rm + 0.05 * mean.detach()
                self.stats[key][1] = 0.95 * rv + 0.05 * ub
        else:
            mean, var = rm, rv
        return (x - mean) * torch.rsqrt(var + 1e-5) * scale + bias

    def _unary(self, x, mask, blk, training, relu=True, use_bn=True):
        h = x @ blk["Dense_0"]["kernel"]
        if use_bn:
            h = self._bn(h, mask, blk["MaskedBatchNorm_0"], training)
        else:
            h = h + blk["MaskedBatchNorm_0"]["bias"]
        return torch.nn.functional.leaky_relu(h, 0.1) if relu else h

    def _kpconv(self, q, s, x, idx, w, extent):
        return torch.stack([
            _torch_kpconv(q[b], s[b], x[b], idx[b], self.kp, w, extent)
            for b in range(q.shape[0])
        ])

    @staticmethod
    def _pool_max(x, idx):
        """Shadow-row max pool (blocks.py:76-90): sentinel gathers -inf;
        all-invalid rows yield 0."""
        out = []
        for b in range(x.shape[0]):
            xp = torch.cat(
                [x[b], torch.full((1, x.shape[-1]), -torch.inf)], 0)
            m = xp[idx[b]].max(1).values
            out.append(torch.where(torch.isfinite(m), m, 0.0))
        return torch.stack(out)

    def __call__(self, pyr, training):
        cfg = self.cfg
        pts = [_t(p) for p in pyr.points]
        msk = [_t(np.asarray(m)) for m in pyr.masks]
        nbr = [_t(np.asarray(i)).long() for i in pyr.neighbors]
        pls = [_t(np.asarray(i)).long() for i in pyr.pools]

        x = torch.ones(*pts[0].shape[:2], cfg.in_features_dim)
        x = x * msk[0][..., None]

        r = cfg.first_subsampling_dl * cfg.conv_radius
        in_dim = cfg.in_features_dim
        out_dim = cfg.first_features_dim
        layer = 0
        counters = {"SimpleBlock": 0, "ResnetBottleneckBlock": 0}
        for block in cfg.architecture:
            if "global" in block or "upsample" in block:
                break
            extent = r * cfg.kp_extent / cfg.conv_radius
            strided = "strided" in block
            if strided:
                q, qm, idx = pts[layer + 1], msk[layer + 1], pls[layer]
            else:
                q, qm, idx = pts[layer], msk[layer], nbr[layer]
            s = pts[layer]
            sm = msk[layer]
            if "simple" in block:
                bp = self.p[f"SimpleBlock_{counters['SimpleBlock']}"]
                counters["SimpleBlock"] += 1
                h = self._kpconv(q, s, x, idx,
                                 bp["KPConvOp_0"]["weights"], extent)
                h = self._bn(h, qm, bp["MaskedBatchNorm_0"], training)
                x = torch.nn.functional.leaky_relu(h, 0.1)
                in_dim = out_dim // 2
            elif "resnetb" in block:
                name = (f"ResnetBottleneckBlock_"
                        f"{counters['ResnetBottleneckBlock']}")
                counters["ResnetBottleneckBlock"] += 1
                bp = self.p[name]
                u = 0
                h = x
                if in_dim != out_dim // 4:
                    h = self._unary(h, sm, bp[f"UnaryBlock_{u}"],
                                    training)
                    u += 1
                h = self._kpconv(q, s, h, idx,
                                 bp["KPConvOp_0"]["weights"], extent)
                h = self._bn(h, qm, bp["MaskedBatchNorm_0"], training)
                h = torch.nn.functional.leaky_relu(h, 0.1)
                h = self._unary(h, qm, bp[f"UnaryBlock_{u}"], training,
                                relu=False)
                u += 1
                shortcut = self._pool_max(x, idx) if strided else x
                if in_dim != out_dim:
                    shortcut = self._unary(
                        shortcut, qm, bp[f"UnaryBlock_{u}"], training,
                        relu=False)
                x = torch.nn.functional.leaky_relu(h + shortcut, 0.1)
                in_dim = out_dim
            else:
                raise ValueError(block)
            if strided:
                layer += 1
                r *= 2
                out_dim *= 2

        m = msk[layer][..., None].float()
        g = (x * m).sum(1) / (m.sum(1).clamp(min=1.0))
        g = self._unary(g, None, self.p["UnaryBlock_0"], training,
                        use_bn=False)
        return self._unary(g, None, self.p["UnaryBlock_1"], training,
                           relu=False, use_bn=False)


def test_kpconv_training_matches_torch():
    cfg = KPConvConfig(num_classes=10, first_subsampling_dl=0.1,
                       first_features_dim=16)
    model = KPCNN(cfg)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)) * 0.5, jnp.float32)
    labels = np.asarray([1, 7])
    v = model.init(jax.random.key(0), xyz, training=False)

    # the shared pyramid (our model rebuilds the identical one inside)
    pyr = build_pyramid(
        xyz, jnp.ones(xyz.shape[:2], bool), cfg.first_subsampling_dl,
        cfg.conv_radius, cfg.deform_radius, cfg.architecture,
        cfg.neighborhood_limits)

    # the op loads kernels per (radius, P); replicate its call exactly:
    r0 = cfg.first_subsampling_dl * cfg.conv_radius
    kp = load_kernels(r0, cfg.num_kernel_points)
    # deeper layers scale r — but load_kernels(r, P) returns the layout
    # scaled by r, and KPConvOp is constructed with the layer radius.
    # The torch walker needs per-layer kernels; verify the scaling is
    # linear so kp_l = kp0 * (r_l / r0):
    kp2 = load_kernels(2 * r0, cfg.num_kernel_points)
    np.testing.assert_allclose(kp2, 2 * np.asarray(kp), rtol=1e-5)

    class ScaledKPCNN(_TorchKPCNN):
        def _kpconv(self, q, s, x, idx, w, extent):
            # layer radius = extent * conv_radius / kp_extent
            scale = (extent * self.cfg.conv_radius
                     / self.cfg.kp_extent) / r0
            saved = self.kp
            self.kp = saved * scale
            try:
                return super()._kpconv(q, s, x, idx, w, extent)
            finally:
                self.kp = saved

    tnet = ScaledKPCNN(v["params"], cfg, np.asarray(kp))

    # ---- step-0 forward parity
    want = tnet(pyr, training=True)
    from pointcloudlib_tpu.train.losses import soft_cross_entropy

    got, _ = model.apply(v, xyz, training=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               rtol=1e-3, atol=1e-3)
    # the parity forward advanced the torch running stats once; our
    # side discarded its mutation — reset so both start the training
    # loop from the init stats
    tnet.stats = {}

    # ---- training: same recipe both sides
    import optax

    tx = optax.chain(optax.clip_by_global_norm(CLIP),
                     optax.sgd(LR, momentum=MOM))
    opt = tx.init(v["params"])

    @jax.jit
    def step(params, bs, opt):
        def lf(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": bs}, xyz, training=True,
                mutable=["batch_stats"])
            return soft_cross_entropy(
                logits, jnp.asarray(labels, jnp.int32)
            ), mut["batch_stats"]

        (l, bs2), g = jax.value_and_grad(lf, has_aux=True)(params)
        up, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, up), bs2, opt2, l

    params, bs = v["params"], v["batch_stats"]
    j_losses = []
    for _ in range(STEPS):
        params, bs, opt, l = step(params, bs, opt)
        j_losses.append(float(l))

    topt = torch.optim.SGD(tnet.leaves(), lr=LR, momentum=MOM)
    t_losses = []
    tl = torch.from_numpy(labels.astype(np.int64))
    for _ in range(STEPS):
        topt.zero_grad()
        out = tnet(pyr, training=True)
        loss = _soft_ce(out, tl, cfg.num_classes)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tnet.leaves(), CLIP)
        topt.step()
        t_losses.append(float(loss.detach()))

    # early steps are tight f32-vs-f32; the last steps of this steep
    # 2-sample overfit descend 3.3→1.4, where ~1e-5 forward noise
    # compounds to ~1% — graduated tolerance
    np.testing.assert_allclose(j_losses[:4], t_losses[:4],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-2, atol=2e-2)

    # parameters after training (deepest KPConv weights + head kernel)
    got_w = np.asarray(
        params["ResnetBottleneckBlock_12"]["KPConvOp_0"]["weights"])
    want_w = tnet.p["ResnetBottleneckBlock_12"]["KPConvOp_0"][
        "weights"].detach().numpy()
    np.testing.assert_allclose(got_w, want_w, rtol=1e-2, atol=1e-3)
    got_h = np.asarray(params["UnaryBlock_1"]["Dense_0"]["kernel"])
    want_h = tnet.p["UnaryBlock_1"]["Dense_0"][
        "kernel"].detach().numpy()
    np.testing.assert_allclose(got_h, want_h, rtol=1e-2, atol=1e-3)

    # BN running statistics follow the same update rule (the torch side
    # uses unbiased running var — ~n/(n-1) apart from ours)
    blk = bs["SimpleBlock_0"]["MaskedBatchNorm_0"]
    key = id(tnet.p["SimpleBlock_0"]["MaskedBatchNorm_0"])
    trm, trv = tnet.stats[key]
    np.testing.assert_allclose(np.asarray(blk["mean"]), trm.numpy(),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(blk["var"]), trv.numpy(),
                               rtol=2e-2, atol=2e-3)
