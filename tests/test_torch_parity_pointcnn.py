"""PointCNN parity vs an independent torch implementation.

Covers the full XConv stack (misc/layers.py:413-517 semantics): the
two-stage coordinate lift, the three-stage K×K X-transform generator
(with the reference's act-before-BN quirk in stage 0 and the (1,K) conv
as a linear map over the flattened neighborhood), X·fts, the
depthwise-separable end conv (depthwise (1,K) + 1×1, act-before-BN),
the C_in→C_out/2 feature lift, FPS sampling (CUDA sampler semantics:
seed 0, near-origin skip) and dilated kNN (every D-th rank).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models.pointcnn import PointCNNCls  # noqa: E402


def torch_fps_skip(xyz, m):
    """Reference CUDA FPS: seed 0, min-distance cache, skip |p|<=1e-3
    (misc/ops.py:162-163)."""
    b, n, _ = xyz.shape
    idx = torch.zeros(b, m, dtype=torch.long)
    mind = torch.full((b, n), 1e10)
    skip = (xyz.pow(2).sum(-1) <= 1e-3)
    last = torch.zeros(b, dtype=torch.long)
    for j in range(1, m):
        lastp = xyz[torch.arange(b), last]
        d = ((xyz - lastp[:, None]) ** 2).sum(-1)
        mind = torch.minimum(mind, d)
        cand = torch.where(skip, torch.full_like(mind, -1e10), mind)
        last = cand.argmax(-1)
        idx[:, j] = last
    return idx


def gather_pts(x, idx):
    return torch.gather(
        x, 1, idx.reshape(idx.shape[0], -1, 1).expand(-1, -1, x.shape[-1])
    ).reshape(*idx.shape, x.shape[-1])


class TDense(torch.nn.Module):
    """linear → (act?BN? in either order) like the repo's DenseBlock."""

    def __init__(self, cin, cout, with_bn=True, act=True,
                 act_before_bn=False):
        super().__init__()
        self.lin = torch.nn.Linear(cin, cout)
        self.bn = torch.nn.BatchNorm1d(cout) if with_bn else None
        self.act = act
        self.act_before_bn = act_before_bn

    def forward(self, x):  # [..., C]
        h = self.lin(x)
        shp = h.shape

        def bn(v):
            return self.bn(v.reshape(-1, shp[-1])).reshape(shp)

        if self.act_before_bn:
            if self.act:
                h = torch.relu(h)
            if self.bn is not None:
                h = bn(h)
        else:
            if self.bn is not None:
                h = bn(h)
            if self.act:
                h = torch.relu(h)
        return h


class TXConv(torch.nn.Module):
    def __init__(self, c_in, c_out, k, c_mid, dm):
        super().__init__()
        self.k, self.dm = k, dm
        self.lift1 = TDense(3, c_mid)
        self.lift2 = TDense(c_mid, c_mid)
        self.xt0 = TDense(k * 3, k * k, act_before_bn=True)
        self.xt1 = TDense(k * k, k * k)
        self.xt2 = TDense(k * k, k * k, with_bn=False, act=False)
        c = c_mid + c_in
        self.depthwise = torch.nn.Parameter(torch.randn(c, k, dm) * 0.1)
        self.end = torch.nn.Linear(c * dm, c_out, bias=False)
        self.end_bn = torch.nn.BatchNorm1d(c_out)

    def forward(self, rep, pts, fts):
        k = self.k
        local = pts - rep[:, :, None, :]
        lifted = self.lift2(self.lift1(local))
        cat = lifted if fts is None else torch.cat([lifted, fts], -1)
        flat = local.reshape(*local.shape[:2], k * 3)
        x = self.xt2(self.xt1(self.xt0(flat)))
        X = x.reshape(*x.shape[:2], k, k)
        h = torch.einsum("bpij,bpjc->bpic", X, cat)
        h = torch.einsum("bpkc,ckm->bpcm", h, self.depthwise)
        h = h.reshape(*h.shape[:2], -1)
        h = torch.relu(self.end(h))  # SepConv: act before BN
        shp = h.shape
        return self.end_bn(h.reshape(-1, shp[-1])).reshape(shp)


class TPointCNNLayer(torch.nn.Module):
    def __init__(self, c_in, c_out, k, d=1, p=-1):
        super().__init__()
        self.c_in, self.k, self.d, self.p = c_in, k, d, p
        if c_in != 0:
            self.lift = TDense(c_in, c_out // 2)
            c_mid, dm = c_out // 4, int(math.ceil(c_out / c_in))
            xin = c_out // 2
        else:
            self.lift = None
            c_mid, dm, xin = c_out // 2, 4, 0
        self.xconv = TXConv(xin, c_out, k, c_mid, dm)

    def forward(self, pts, fts):
        if 0 < self.p < pts.shape[1]:
            rep = gather_pts(pts, torch_fps_skip(pts, self.p))
        else:
            rep = pts
        if self.lift is not None and fts is not None:
            fts = self.lift(fts)
        else:
            fts = None
        d2 = torch.cdist(rep, pts) ** 2
        idx = d2.topk(self.k * self.d, dim=-1, largest=False).indices
        idx = idx[..., :: self.d]
        pts_reg = gather_pts(pts, idx)
        fts_reg = gather_pts(fts, idx) if fts is not None else None
        return rep, self.xconv(rep, pts_reg, fts_reg)


class TPointCNN(torch.nn.Module):
    """The cls net: (3,48,8,1,-1)→(48,96,12,2,384)→(96,192,16,2,128)→
    (192,384,16,3,128) + Dense 192/128/n head, mean pool
    (networks/cls/pointcnn.py:23-52)."""

    def __init__(self, n_classes=40):
        super().__init__()
        self.l1 = TPointCNNLayer(3, 48, 8, 1, -1)
        self.l2 = TPointCNNLayer(48, 96, 12, 2, 384)
        self.l3 = TPointCNNLayer(96, 192, 16, 2, 128)
        self.l4 = TPointCNNLayer(192, 384, 16, 3, 128)
        self.h1 = TDense(384, 192)
        self.h2 = TDense(192, 128)
        self.h3 = TDense(128, n_classes, with_bn=False, act=False)

    def forward(self, xyz):
        p, f = self.l1(xyz, xyz)
        p, f = self.l2(p, f)
        p, f = self.l3(p, f)
        p, f = self.l4(p, f)
        return self.h3(self.h2(self.h1(f))).mean(1)


def _dense_params(m: TDense):
    p = {"Dense_0": {
        "kernel": m.lin.weight.detach().numpy().T.astype(np.float32),
        "bias": m.lin.bias.detach().numpy().astype(np.float32),
    }}
    s = {}
    if m.bn is not None:
        p["BatchNorm_0"] = {
            "scale": m.bn.weight.detach().numpy(),
            "bias": m.bn.bias.detach().numpy(),
        }
        s["BatchNorm_0"] = {
            "mean": m.bn.running_mean.detach().numpy(),
            "var": m.bn.running_var.detach().numpy(),
        }
    return p, s


def _xconv_params(m: TXConv):
    p, s = {}, {}
    for i, sub in enumerate([m.lift1, m.lift2, m.xt0, m.xt1, m.xt2]):
        p[f"DenseBlock_{i}"], s[f"DenseBlock_{i}"] = _dense_params(sub)
    p["depthwise"] = m.depthwise.detach().numpy().astype(np.float32)
    p["depthwise_bias"] = np.zeros(
        (p["depthwise"].shape[0] * p["depthwise"].shape[2],), np.float32)
    p["Dense_0"] = {
        "kernel": m.end.weight.detach().numpy().T.astype(np.float32)}
    p["BatchNorm_0"] = {"scale": m.end_bn.weight.detach().numpy(),
                        "bias": m.end_bn.bias.detach().numpy()}
    s["BatchNorm_0"] = {"mean": m.end_bn.running_mean.detach().numpy(),
                        "var": m.end_bn.running_var.detach().numpy()}
    return p, s


def _convert(tnet: TPointCNN, n_classes=40):
    params, stats = {}, {}
    for i, layer in enumerate([tnet.l1, tnet.l2, tnet.l3, tnet.l4]):
        lp, ls = {}, {}
        if layer.lift is not None:
            lp["DenseBlock_0"], ls["DenseBlock_0"] = _dense_params(
                layer.lift)
        lp["XConv_0"], ls["XConv_0"] = _xconv_params(layer.xconv)
        params[f"PointCNNLayer_{i}"] = lp
        stats[f"PointCNNLayer_{i}"] = ls
    for i, h in enumerate([tnet.h1, tnet.h2, tnet.h3]):
        params[f"DenseBlock_{i}"], st = _dense_params(h)
        if st:
            stats[f"DenseBlock_{i}"] = st
    return {"params": params,
            "batch_stats": stats}


def test_pointcnn_cls_logits_match_torch():
    torch.manual_seed(0)
    tnet = TPointCNN()
    # give BN nontrivial running stats
    with torch.no_grad():
        tnet.train()
        warm = torch.randn(4, 512, 3) * 0.5
        warm = warm / warm.norm(dim=-1, keepdim=True)
        tnet(warm)
        tnet.eval()

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2, 512, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts)).numpy()

    model = PointCNNCls(n_classes=40)
    variables = _convert(tnet)
    got = np.asarray(model.apply(variables, jnp.asarray(pts),
                                 training=False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# ---- reference-keyed checkpoint import ------------------------------
# Torch modules below reproduce the reference's EXACT module tree and
# weight shapes (misc/layers.py): Dense_Conv1d/2d (.linear 1x1 conv
# with bias + .bn, conv->bn->relu), Conv (.conv (1,K) bias=False +
# .bn, conv->relu->bn), EndChannels wrappers (.f), SepConv
# (.conv.0 depthwise (1,K) groups=C WITH bias + .conv.1 pointwise
# bias=False + .bn, act before bn).


class RDense1d(torch.nn.Module):
    def __init__(self, cin, cout, with_bn=True, act=True):
        super().__init__()
        self.linear = torch.nn.Conv1d(cin, cout, 1, bias=True)
        self.bn = torch.nn.BatchNorm1d(cout) if with_bn else None
        self.act = act

    def forward(self, x):  # [B, N, C] channel-last
        h = self.linear(x.transpose(1, 2))
        if self.bn is not None:
            h = self.bn(h)
        if self.act:
            h = torch.relu(h)
        return h.transpose(1, 2)


class RDense2d(torch.nn.Module):
    def __init__(self, cin, cout, with_bn=True, act=True):
        super().__init__()
        self.linear = torch.nn.Conv2d(cin, cout, 1, bias=True)
        self.bn = torch.nn.BatchNorm2d(cout) if with_bn else None
        self.act = act

    def forward(self, x):  # [N, C, P, K] channel-first
        h = self.linear(x)
        if self.bn is not None:
            h = self.bn(h)
        if self.act:
            h = torch.relu(h)
        return h


class RConv(torch.nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, (1, k), bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)

    def forward(self, x):  # conv -> act -> bn (layers.py:195-200)
        return self.bn(torch.relu(self.conv(x)))


class _RSepConv(torch.nn.Module):
    def __init__(self, c, cout, k, dm):
        super().__init__()
        self.conv = torch.nn.Sequential(
            torch.nn.Conv2d(c, c * dm, (1, k), groups=c, bias=True),
            torch.nn.Conv2d(c * dm, cout, 1, bias=False),
        )
        self.bn = torch.nn.BatchNorm2d(cout)

    def forward(self, x):  # act before bn (layers.py:158-169)
        return self.bn(torch.relu(self.conv(x)))


class _RWrap(torch.nn.Module):  # EndChannels / EndChannels1d: .f
    def __init__(self, f):
        super().__init__()
        self.f = f


class RXConv(torch.nn.Module):
    def __init__(self, c_in, c_out, k, c_mid, dm):
        super().__init__()
        self.k = k
        self.dense1 = RDense2d(3, c_mid)
        self.dense2 = RDense2d(c_mid, c_mid)
        self.x_trans_0 = RConv(3, k * k, k)
        self.x_trans_1 = RDense2d(k * k, k * k)
        self.x_trans_2 = RDense2d(k * k, k * k, with_bn=False, act=False)
        self.end_conv = _RWrap(_RSepConv(c_mid + c_in, c_out, k, dm))

    def forward(self, rep, pts, fts):  # channel-last ins, as XConv.execute
        k = self.k
        local = pts - rep[:, :, None]
        pl = local.permute(0, 3, 1, 2)            # [N, 3, P, K]
        lifted = self.dense2(self.dense1(pl))
        cat = torch.cat([lifted, fts.permute(0, 3, 1, 2)], 1)
        x = self.x_trans_2(self.x_trans_1(self.x_trans_0(pl)))
        X = x.permute(0, 2, 3, 1).reshape(
            x.shape[0], x.shape[2], k, k)
        fx = torch.matmul(X, cat.permute(0, 2, 3, 1))  # [N, P, K, C]
        h = self.end_conv.f(fx.permute(0, 3, 1, 2))    # [N, Cout, P, 1]
        return h.permute(0, 2, 3, 1).squeeze(2)


class RLayer(torch.nn.Module):
    def __init__(self, c_in, c_out, k, d=1, p=-1):
        super().__init__()
        self.k, self.d, self.p = k, d, p
        pc = torch.nn.Module()
        pc.dense = _RWrap(RDense1d(c_in, c_out // 2))
        c_mid, dm = c_out // 4, int(math.ceil(c_out / c_in))
        pc.x_conv = RXConv(c_out // 2, c_out, k, c_mid, dm)
        self.pointcnn = pc

    def forward(self, pts, fts):
        if 0 < self.p < pts.shape[1]:
            rep = gather_pts(pts, torch_fps_skip(pts, self.p))
        else:
            rep = pts
        fts = self.pointcnn.dense.f(fts)
        d2 = torch.cdist(rep, pts) ** 2
        idx = d2.topk(self.k * self.d, dim=-1, largest=False).indices
        idx = idx[..., :: self.d]
        return rep, self.pointcnn.x_conv(
            rep, gather_pts(pts, idx), gather_pts(fts, idx))


class RPointCNN(torch.nn.Module):
    def __init__(self, n_classes=40):
        super().__init__()
        self.pcnn1 = RLayer(3, 48, 8, 1, -1)
        self.pcnn2 = torch.nn.ModuleList([
            RLayer(48, 96, 12, 2, 384),
            RLayer(96, 192, 16, 2, 128),
            RLayer(192, 384, 16, 3, 128),
        ])
        self.fcn = torch.nn.ModuleList([
            RDense1d(384, 192),
            RDense1d(192, 128),
            RDense1d(128, n_classes, with_bn=False, act=False),
        ])

    def forward(self, xyz):
        p, f = self.pcnn1(xyz, xyz)
        for layer in self.pcnn2:
            p, f = layer(p, f)
        for h in self.fcn:
            f = h(f)
        return f.mean(1)


def test_pointcnn_reference_checkpoint_import():
    """A state_dict with the reference's exact module tree and conv
    weight SHAPES ((1,K) x-trans conv, grouped depthwise + bias)
    imports via interop.pointcnn_from_reference and reproduces the
    logits."""
    from pointcloudlib_tpu.utils.interop import (
        normalize_reference_keys,
        pointcnn_from_reference,
    )

    torch.manual_seed(6)
    tnet = RPointCNN()
    with torch.no_grad():
        tnet.train()
        warm = torch.randn(4, 512, 3) * 0.5
        warm = warm / warm.norm(dim=-1, keepdim=True)
        tnet(warm)
        tnet.eval()

    rng = np.random.default_rng(8)
    pts = rng.standard_normal((2, 512, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts)).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = pointcnn_from_reference(normalize_reference_keys(sd))
    model = PointCNNCls(n_classes=40)
    got = np.asarray(model.apply(variables, jnp.asarray(pts),
                                 training=False))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class RDecoder(torch.nn.Module):
    """Reference RandPointCNN_Decoder (misc/layers.py:279-303):
    PointCNN projecting the lower-res level onto the higher-res points
    + conv_fuse over the skip concat."""

    def __init__(self, c_in, c_out, c_last, k):
        super().__init__()
        self.k = k
        pc = torch.nn.Module()
        pc.dense = _RWrap(RDense1d(c_in, c_out // 2))
        c_mid, dm = c_out // 4, int(math.ceil(c_out / c_in))
        pc.x_conv = RXConv(c_out // 2, c_out, k, c_mid, dm)
        self.pointcnn = pc
        self.conv_fuse = _RWrap(RDense1d(c_out + c_last, c_out))

    def forward(self, xl, fl, xh, fh):
        fts = self.pointcnn.dense.f(fl)
        d2 = torch.cdist(xh, xl) ** 2
        idx = d2.topk(self.k, dim=-1, largest=False).indices
        proj = self.pointcnn.x_conv(
            xh, gather_pts(xl, idx), gather_pts(fts, idx))
        return self.conv_fuse.f(torch.cat([proj, fh], -1))


class RPointCNNPartSeg(torch.nn.Module):
    """Reference PointCNN_partseg tree
    (networks/seg/pointcnn_partseg.py:17-47)."""

    def __init__(self, part_num=50):
        super().__init__()
        self.encoder_0 = RLayer(3, 256, 8, 1, -1)
        self.encoder_1 = RLayer(256, 256, 12, 1, 768)
        self.encoder_2 = RLayer(256, 512, 16, 1, 384)
        self.encoder_3 = RLayer(512, 1024, 16, 1, 128)
        self.decoder_0 = RDecoder(1024, 1024, 1024, 16)
        self.decoder_1 = RDecoder(1024, 512, 512, 16)
        self.decoder_2 = RDecoder(512, 256, 256, 12)
        self.decoder_3 = RDecoder(256, part_num, 256, 8)

    def forward(self, xyz):
        p0, f0 = self.encoder_0(xyz, xyz)
        p1, f1 = self.encoder_1(p0, f0)
        p2, f2 = self.encoder_2(p1, f1)
        p3, f3 = self.encoder_3(p2, f2)
        f3 = self.decoder_0(p3, f3, p3, f3)
        f2 = self.decoder_1(p3, f3, p2, f2)
        f1 = self.decoder_2(p2, f2, p1, f1)
        return self.decoder_3(p1, f1, p0, f0)


def test_pointcnn_partseg_reference_checkpoint_import():
    from pointcloudlib_tpu.models import get_seg_model
    from pointcloudlib_tpu.utils.interop import (
        normalize_reference_keys,
        pointcnn_partseg_from_reference,
    )

    torch.manual_seed(14)
    tnet = RPointCNNPartSeg(part_num=50)
    with torch.no_grad():
        tnet.train()
        warm = torch.randn(2, 96, 3) * 0.5
        warm = warm / warm.norm(dim=-1, keepdim=True)
        tnet(warm)
        tnet.eval()

    rng = np.random.default_rng(14)
    pts = rng.standard_normal((2, 96, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    onehot = np.eye(16, dtype=np.float32)[[1, 5]]
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts)).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = pointcnn_partseg_from_reference(
        normalize_reference_keys(sd))
    model = get_seg_model("pointcnn", part_num=50)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(onehot),
                    training=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
