"""PointConv parity vs an independent torch implementation.

Covers FPS (no near-origin skip — the reference PointConv uses the
python FPS, misc/utils.py:74), kNN grouping, the Gaussian-KDE density,
DensityNet/WeightNet, the density-weighted neighbor-sum einsum, and the
16·C linear. The neighbor einsum sums over k, so neighbor ORDER is
irrelevant as long as both sides select the same SET.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models import get_cls_model  # noqa: E402


def torch_fps_noskip(xyz, m):
    b, n, _ = xyz.shape
    idx = torch.zeros(b, m, dtype=torch.long)
    mind = torch.full((b, n), 1e10)
    last = torch.zeros(b, dtype=torch.long)
    for j in range(1, m):
        lastp = xyz[torch.arange(b), last]
        mind = torch.minimum(mind, ((xyz - lastp[:, None]) ** 2).sum(-1))
        last = mind.argmax(-1)
        idx[:, j] = last
    return idx


def gather_pts(x, idx):
    return torch.gather(
        x, 1, idx.reshape(idx.shape[0], -1, 1).expand(-1, -1, x.shape[-1])
    ).reshape(*idx.shape, x.shape[-1])


class TorchMLPStack(torch.nn.Module):
    """Conv-BN-ReLU stack over the trailing channel axis of [B,...,C]."""

    def __init__(self, chans, bias=False):
        super().__init__()
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv2d(chans[i], chans[i + 1], 1, bias=bias)
            for i in range(len(chans) - 1)
        )
        self.bns = torch.nn.ModuleList(
            torch.nn.BatchNorm2d(c) for c in chans[1:]
        )

    def forward(self, x):  # [B, M, K, C] channel-last
        h = x.permute(0, 3, 1, 2)
        for conv, bn in zip(self.convs, self.bns):
            h = torch.relu(bn(conv(h)))
        return h.permute(0, 2, 3, 1)


class TorchPointConvSA(torch.nn.Module):
    def __init__(self, in_ch, mlp, bw, n_points=None, k=None):
        super().__init__()
        self.bw, self.n_points, self.k = bw, n_points, k
        self.mlp = TorchMLPStack([in_ch + 3] + list(mlp))
        self.weightnet = TorchMLPStack([3, 8, 8, 16], bias=True)
        self.densitynet = TorchMLPStack([1, 8, 8, 1], bias=True)
        self.linear = torch.nn.Linear(16 * mlp[-1], mlp[-1])
        self.bn_linear = torch.nn.BatchNorm1d(mlp[-1])

    def forward(self, xyz, feats):
        b, n, _ = xyz.shape
        d2 = torch.cdist(xyz, xyz) ** 2
        density = (torch.exp(-d2 / (2 * self.bw**2)) / (2.5 * self.bw)).mean(-1)
        scale = self.densitynet(density[:, None, :, None])[:, 0]  # [B,N,1]
        if self.n_points is None:
            new_xyz = torch.zeros(b, 1, 3)
            grouped_xyz = xyz[:, None]
            grouped = (
                torch.cat([xyz, feats], -1)[:, None]
                if feats is not None else grouped_xyz
            )
            gd = scale[:, None]
            s = 1
        else:
            fi = torch_fps_noskip(xyz, self.n_points)
            new_xyz = gather_pts(xyz, fi)
            nd = torch.cdist(new_xyz, xyz) ** 2
            ni = nd.topk(self.k, dim=-1, largest=False).indices
            grouped_xyz = gather_pts(xyz, ni) - new_xyz[:, :, None]
            grouped = grouped_xyz
            if feats is not None:
                grouped = torch.cat([grouped_xyz, gather_pts(feats, ni)], -1)
            gd = gather_pts(scale, ni)
            s = self.n_points
        h = self.mlp(grouped) * gd                       # [B,S,K,C]
        w = self.weightnet(grouped_xyz)                  # [B,S,K,16]
        agg = torch.einsum("bskc,bskw->bscw", h, w).reshape(b, s, -1)
        out = torch.relu(
            self.bn_linear(self.linear(agg).permute(0, 2, 1)).permute(0, 2, 1)
        )
        return new_xyz, out


class TorchPointConv(torch.nn.Module):
    def __init__(self, n_classes=40):
        super().__init__()
        self.sa1 = TorchPointConvSA(0, [64, 64, 128], 0.1, 64, 16)
        self.sa2 = TorchPointConvSA(128, [128, 128, 256], 0.2, 16, 16)
        self.sa3 = TorchPointConvSA(256, [256, 512, 1024], 0.4)
        self.fc1 = torch.nn.Linear(1024, 512)
        self.bn1 = torch.nn.BatchNorm1d(512)
        self.fc2 = torch.nn.Linear(512, 256)
        self.bn2 = torch.nn.BatchNorm1d(256)
        self.fc3 = torch.nn.Linear(256, n_classes)

    def forward(self, xyz):
        x1, f1 = self.sa1(xyz, None)
        x2, f2 = self.sa2(x1, f1)
        _, f3 = self.sa3(x2, f2)
        g = f3[:, 0]
        g = torch.relu(self.bn1(self.fc1(g)))
        g = torch.relu(self.bn2(self.fc2(g)))
        return self.fc3(g)


def _convert(tnet):
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}

    def dense(prefix):
        w = sd[f"{prefix}.weight"]
        w = w[..., 0, 0] if w.ndim == 4 else w
        out = {"kernel": np.ascontiguousarray(w.T.astype(np.float32))}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
        return out

    def bn(prefix):
        return (
            {"scale": sd[f"{prefix}.weight"].astype(np.float32),
             "bias": sd[f"{prefix}.bias"].astype(np.float32)},
            {"mean": sd[f"{prefix}.running_mean"].astype(np.float32),
             "var": sd[f"{prefix}.running_var"].astype(np.float32)},
        )

    def stack(prefix, n):
        p, s = {}, {}
        for i in range(n):
            bp, bs = bn(f"{prefix}.bns.{i}")
            p[f"DenseBNAct_{i}"] = {"Dense_0": dense(f"{prefix}.convs.{i}"),
                                    "BatchNorm_0": bp}
            s[f"DenseBNAct_{i}"] = {"BatchNorm_0": bs}
        return p, s

    params, stats = {}, {}
    for i in range(3):
        sp, ss = {}, {}
        for sub, tname, n in [("PointMLP_0", "mlp", 3),
                              ("WeightNet_0", "weightnet", 3),
                              ("DensityNet_0", "densitynet", 3)]:
            p, s = stack(f"sa{i+1}.{tname}", n)
            sp[sub] = p
            ss[sub] = s
        sp["Dense_0"] = dense(f"sa{i+1}.linear")
        bp, bs = bn(f"sa{i+1}.bn_linear")
        sp["BatchNorm_0"] = bp
        ss["BatchNorm_0"] = bs
        params[f"PointConvSA_{i}"] = sp
        stats[f"PointConvSA_{i}"] = ss
    for li, (dname, bname) in enumerate([("fc1", "bn1"), ("fc2", "bn2")]):
        bp, bs = bn(bname)
        params[f"DenseBNAct_{li}"] = {"Dense_0": dense(dname),
                                      "BatchNorm_0": bp}
        stats[f"DenseBNAct_{li}"] = {"BatchNorm_0": bs}
    params["Dense_0"] = dense("fc3")
    return {"params": params, "batch_stats": stats}


def test_pointconv_logits_match_torch():
    torch.manual_seed(3)
    tnet = TorchPointConv().eval()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 128, 3))
        tnet.eval()

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts)).numpy()

    # our PointConvDensityCls with matching tiny sizes
    from pointcloudlib_tpu.models.pointconv import PointConvSA, DenseBNAct
    import flax.linen as nn

    class SmallPointConv(nn.Module):
        @nn.compact
        def __call__(self, xyz, feats=None, training=False):
            x1, f1 = PointConvSA(mlp=[64, 64, 128], bandwidth=0.1,
                                 n_points=64, k=16)(xyz, None, training)
            x2, f2 = PointConvSA(mlp=[128, 128, 256], bandwidth=0.2,
                                 n_points=16, k=16)(x1, f1, training)
            _, f3 = PointConvSA(mlp=[256, 512, 1024],
                                bandwidth=0.4)(x2, f2, training)
            g = f3[:, 0]
            g = DenseBNAct(512, use_bias=True)(g, training)
            g = DenseBNAct(256, use_bias=True)(g, training)
            return nn.Dense(40)(g)

    model = SmallPointConv()
    variables = _convert(tnet)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), training=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_pointconv_reference_checkpoint_import():
    """A state_dict with the reference's key scheme (mlp_convs/mlp_bns
    stacks, pointconv_utils.py:340-400, BIASED SA convs like the
    reference's nn.Conv default) imports via
    interop.pointconv_from_reference — the SA conv biases fold into the
    BN running means exactly."""
    from pointcloudlib_tpu.utils.interop import (
        normalize_reference_keys,
        pointconv_from_reference,
    )

    torch.manual_seed(5)
    tnet = TorchPointConv()
    # reference SA convs carry biases (nn.Conv default); the replica's
    # stack is biasless — swap in biased convs (fresh bias init)
    for sa in (tnet.sa1, tnet.sa2, tnet.sa3):
        for i, conv in enumerate(sa.mlp.convs):
            nc = torch.nn.Conv2d(conv.in_channels, conv.out_channels,
                                 1, bias=True)
            with torch.no_grad():
                nc.weight.copy_(conv.weight)
            sa.mlp.convs[i] = nc
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 128, 3))
        tnet.eval()

    rng = np.random.default_rng(6)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts)).numpy()

    # rename replica keys -> the reference's scheme
    sd = {}
    for k, v in tnet.state_dict().items():
        k = k.replace(".convs.", ".mlp_convs.")
        k = k.replace(".bns.", ".mlp_bns.")
        for n in (1, 2, 3):  # SA-level stack sits directly under sa{n}
            k = k.replace(f"sa{n}.mlp.mlp_", f"sa{n}.mlp_")
        sd[k] = v.numpy()

    from pointcloudlib_tpu.models.pointconv import PointConvSA, DenseBNAct
    import flax.linen as nn

    class SmallPointConv(nn.Module):
        @nn.compact
        def __call__(self, xyz, feats=None, training=False):
            x1, f1 = PointConvSA(mlp=[64, 64, 128], bandwidth=0.1,
                                 n_points=64, k=16)(xyz, None, training)
            x2, f2 = PointConvSA(mlp=[128, 128, 256], bandwidth=0.2,
                                 n_points=16, k=16)(x1, f1, training)
            _, f3 = PointConvSA(mlp=[256, 512, 1024],
                                bandwidth=0.4)(x2, f2, training)
            g = f3[:, 0]
            g = DenseBNAct(512, use_bias=True)(g, training)
            g = DenseBNAct(256, use_bias=True)(g, training)
            return nn.Dense(40)(g)

    variables = pointconv_from_reference(normalize_reference_keys(sd))
    got = np.asarray(
        SmallPointConv().apply(variables, jnp.asarray(pts),
                               training=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


class RefStack(torch.nn.Module):
    """Reference mlp_convs/mlp_bns pair lists (pointconv_utils.py:
    259-269 naming), channel-last apply, biased convs like nn.Conv's
    default."""

    def __init__(self, chans, bias=True):
        super().__init__()
        self.mlp_convs = torch.nn.ModuleList(
            torch.nn.Conv2d(chans[i], chans[i + 1], 1, bias=bias)
            for i in range(len(chans) - 1))
        self.mlp_bns = torch.nn.ModuleList(
            torch.nn.BatchNorm2d(c) for c in chans[1:])

    def run_stack(self, x):  # [B, ..., C] channel-last 4D
        h = x.permute(0, 3, 1, 2)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            h = torch.relu(bn(conv(h)))
        return h.permute(0, 2, 3, 1)


class RefPCSA(RefStack):
    """Reference-keyed PointConvDensitySetAbstraction."""

    def __init__(self, in_ch, mlp, bw, n_points=None, k=None):
        super().__init__([in_ch + 3] + list(mlp))
        self.bw, self.n_points, self.k = bw, n_points, k
        self.weightnet = RefStack([3, 8, 8, 16])
        self.densitynet = RefStack([1, 8, 8, 1])
        self.linear = torch.nn.Linear(16 * mlp[-1], mlp[-1])
        self.bn_linear = torch.nn.BatchNorm1d(mlp[-1])

    def _density(self, xyz):
        d2 = torch.cdist(xyz, xyz) ** 2
        density = (torch.exp(-d2 / (2 * self.bw**2))
                   / (2.5 * self.bw)).mean(-1)
        return self.densitynet.run_stack(
            density[:, :, None, None])[:, :, 0]  # [B,N,1]

    def _head(self, h, w):
        b, s = h.shape[:2]
        agg = torch.einsum("bskc,bskw->bscw", h, w).reshape(b, s, -1)
        return torch.relu(
            self.bn_linear(self.linear(agg).permute(0, 2, 1))
            .permute(0, 2, 1))

    def forward(self, xyz, feats):
        scale = self._density(xyz)
        if self.n_points is None:
            new_xyz = torch.zeros(xyz.shape[0], 1, 3)
            grouped_xyz = xyz[:, None]
            grouped = (torch.cat([xyz, feats], -1)[:, None]
                       if feats is not None else grouped_xyz)
            gd = scale[:, None]
        else:
            fi = torch_fps_noskip(xyz, self.n_points)
            new_xyz = gather_pts(xyz, fi)
            nd = torch.cdist(new_xyz, xyz) ** 2
            ni = nd.topk(self.k, dim=-1, largest=False).indices
            grouped_xyz = gather_pts(xyz, ni) - new_xyz[:, :, None]
            grouped = grouped_xyz
            if feats is not None:
                grouped = torch.cat(
                    [grouped_xyz, gather_pts(feats, ni)], -1)
            gd = gather_pts(scale, ni)
        h = self.run_stack(grouped) * gd
        w = self.weightnet.run_stack(grouped_xyz)
        return new_xyz, self._head(h, w)


class RefPCInterp(RefPCSA):
    """Reference-keyed PointConvDensitySetInterpolation — with OUR
    documented divergence (identity ordering instead of the
    reference's silent FPS permutation, models/pointconv.py docstring);
    the module tree and weight shapes are the reference's."""

    def __init__(self, in_ch, mlp, bw, k=16):
        super().__init__(in_ch - 3, mlp, bw, None, k)

    def forward(self, xf, xc, fc):
        d2, idx = (torch.cdist(xf, xc) ** 2).topk(
            3, dim=-1, largest=False)
        w = 1.0 / (d2 + 1e-8)
        w = w / w.sum(-1, keepdim=True)
        up = (gather_pts(fc, idx) * w[..., None]).sum(2)
        scale = self._density(xf)
        ni = (torch.cdist(xf, xf) ** 2).topk(
            self.k, dim=-1, largest=False).indices
        local = gather_pts(xf, ni) - xf[:, :, None]
        grouped = torch.cat([local, gather_pts(up, ni)], -1)
        gd = gather_pts(scale, ni)
        h = self.run_stack(grouped) * gd
        wn = self.weightnet.run_stack(local)
        return self._head(h, wn)


class RefPointConvPartSeg(torch.nn.Module):
    """Reference PointConv_partseg tree
    (networks/seg/pointconv_partseg.py:12-38)."""

    def __init__(self, part_num=50):
        super().__init__()
        self.sa0 = RefPCSA(0, [32, 32, 64], 0.1, 1024, 32)
        self.sa1 = RefPCSA(64, [64, 64, 128], 0.2, 256, 32)
        self.sa2 = RefPCSA(128, [128, 128, 256], 0.4, 64, 32)
        self.sa3 = RefPCSA(256, [256, 256, 512], 0.8, 36, 32)
        self.in0 = RefPCInterp(512 + 3, [512, 512], 0.8)
        self.in1 = RefPCInterp(512 + 3, [256, 256], 0.4)
        self.in2 = RefPCInterp(256 + 3, [128, 128], 0.2)
        self.in3 = RefPCInterp(128 + 3, [128, 128, 128], 0.1)
        self.fc1 = torch.nn.Conv1d(128, 128, 1)
        self.bn1 = torch.nn.BatchNorm1d(128)
        self.fc3 = torch.nn.Conv1d(128, part_num, 1)

    def forward(self, xyz):
        l1x, l1f = self.sa0(xyz, None)
        l2x, l2f = self.sa1(l1x, l1f)
        l3x, l3f = self.sa2(l2x, l2f)
        l4x, l4f = self.sa3(l3x, l3f)
        l3f = self.in0(l3x, l4x, l4f)
        l2f = self.in1(l2x, l3x, l3f)
        l1f = self.in2(l1x, l2x, l2f)
        l0f = self.in3(xyz, l1x, l1f)
        h = torch.relu(self.bn1(self.fc1(l0f.transpose(1, 2))))
        return self.fc3(h).transpose(1, 2)


def test_pointconv_partseg_reference_checkpoint_import():
    """RefPCInterp's in_ch bookkeeping: the reference passes
    in_channel = C_coarse + 3 and the stack consumes [local ‖ up]."""
    from pointcloudlib_tpu.models import get_seg_model
    from pointcloudlib_tpu.utils.interop import (
        normalize_reference_keys,
        pointconv_partseg_from_reference,
    )

    torch.manual_seed(15)
    tnet = RefPointConvPartSeg(part_num=50).eval()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(2, 1100, 3))
        tnet.eval()

    rng = np.random.default_rng(15)
    pts = rng.standard_normal((1, 1100, 3)).astype(np.float32)
    onehot = np.eye(16, dtype=np.float32)[[4]]
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts)).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = pointconv_partseg_from_reference(
        normalize_reference_keys(sd))
    model = get_seg_model("pointconv", part_num=50)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(onehot),
                    training=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
