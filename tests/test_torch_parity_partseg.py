"""Part-segmentation parity: PointNet partseg vs independent torch.

Pure dense ops (both STNs, five shared-MLP stages, the 4944-channel
concat head — reference networks/seg/pointnet_partseg.py:14-67), so
identical weights must give identical per-point logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models import get_seg_model  # noqa: E402


class TorchSTN(torch.nn.Module):
    def __init__(self, k):
        super().__init__()
        self.k = k
        dims = [k, 64, 128, 1024]
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv1d(dims[i], dims[i + 1], 1, bias=False)
            for i in range(3))
        self.cbns = torch.nn.ModuleList(
            torch.nn.BatchNorm1d(d) for d in dims[1:])
        self.fc1 = torch.nn.Linear(1024, 512, bias=False)
        self.fbn1 = torch.nn.BatchNorm1d(512)
        self.fc2 = torch.nn.Linear(512, 256, bias=False)
        self.fbn2 = torch.nn.BatchNorm1d(256)
        self.fc3 = torch.nn.Linear(256, k * k)
        torch.nn.init.zeros_(self.fc3.weight)
        torch.nn.init.zeros_(self.fc3.bias)

    def forward(self, x):  # [B, C, N]
        for conv, bn in zip(self.convs, self.cbns):
            x = torch.relu(bn(conv(x)))
        x = x.max(dim=2).values
        x = torch.relu(self.fbn1(self.fc1(x)))
        x = torch.relu(self.fbn2(self.fc2(x)))
        m = self.fc3(x) + torch.eye(self.k).reshape(-1)
        return m.reshape(-1, self.k, self.k)


class TorchPointNetSeg(torch.nn.Module):
    """Reference PointNet_partseg (pointnet_partseg.py:14-67)."""

    def __init__(self, part_num=50):
        super().__init__()
        self.stn = TorchSTN(3)
        self.fstn = TorchSTN(128)
        dims = [3, 64, 128, 128, 512, 2048]
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv1d(dims[i], dims[i + 1], 1, bias=False)
            for i in range(5))
        self.bns = torch.nn.ModuleList(
            torch.nn.BatchNorm1d(d) for d in dims[1:])
        hd = [4944, 256, 256, 128]
        self.hconvs = torch.nn.ModuleList(
            torch.nn.Conv1d(hd[i], hd[i + 1], 1, bias=False)
            for i in range(3))
        self.hbns = torch.nn.ModuleList(
            torch.nn.BatchNorm1d(d) for d in hd[1:])
        self.final = torch.nn.Conv1d(128, part_num, 1)

    def forward(self, x, label):  # x [B, 3, N], label [B, 16]
        n = x.shape[2]
        t = self.stn(x)
        x = torch.bmm(x.transpose(1, 2), t).transpose(1, 2)
        outs = []
        h = x
        for i in range(3):
            h = torch.relu(self.bns[i](self.convs[i](h)))
            outs.append(h)
        ft = self.fstn(h)
        h = torch.bmm(h.transpose(1, 2), ft).transpose(1, 2)
        h4 = torch.relu(self.bns[3](self.convs[3](h)))
        h5 = self.bns[4](self.convs[4](h4))  # no relu (ref line 57)
        outs += [h4, h5]
        g = torch.cat([h5.max(dim=2).values, label], dim=1)  # [B, 2064]
        gexp = g[:, :, None].expand(-1, -1, n)
        cat = torch.cat([gexp] + outs, dim=1)  # [B, 4944, N]
        for conv, bn in zip(self.hconvs, self.hbns):
            cat = torch.relu(bn(conv(cat)))
        return self.final(cat).transpose(1, 2)  # [B, N, parts]


def _convert(tnet):
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}

    def dense(prefix):
        w = sd[f"{prefix}.weight"]
        w = w[..., 0] if w.ndim == 3 else w
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

    def stack(pairs):
        p, s = {}, {}
        for i, (dpref, bpref) in enumerate(pairs):
            bp, bs = bn(bpref)
            p[f"DenseBNAct_{i}"] = {"Dense_0": dense(dpref),
                                    "BatchNorm_0": bp}
            s[f"DenseBNAct_{i}"] = {"BatchNorm_0": bs}
        return p, s

    def stn(tp):
        p, s = {}, {}
        cp, cs = stack([(f"{tp}.convs.{i}", f"{tp}.cbns.{i}")
                        for i in range(3)])
        p["PointMLP_0"], s["PointMLP_0"] = cp, cs
        fp, fs = stack([(f"{tp}.fc1", f"{tp}.fbn1"),
                        (f"{tp}.fc2", f"{tp}.fbn2")])
        p["PointMLP_1"], s["PointMLP_1"] = fp, fs
        p["Dense_0"] = dense(f"{tp}.fc3")
        return p, s

    params, stats = {}, {}
    params["STN_0"], stats["STN_0"] = stn("stn")
    params["STN_1"], stats["STN_1"] = stn("fstn")
    for i in range(4):  # PointMLP_0..3 ← conv1..4 (relu blocks)
        p, s = stack([(f"convs.{i}", f"bns.{i}")])
        params[f"PointMLP_{i}"] = p
        stats[f"PointMLP_{i}"] = s
    # conv5+bn5 without relu → DenseBNAct_0 (act=None)
    bp, bs = bn("bns.4")
    params["DenseBNAct_0"] = {"Dense_0": dense("convs.4"),
                              "BatchNorm_0": bp}
    stats["DenseBNAct_0"] = {"BatchNorm_0": bs}
    # head PointMLP_4 (256,256,128) + final Dense_0
    p, s = stack([(f"hconvs.{i}", f"hbns.{i}") for i in range(3)])
    params["PointMLP_4"] = p
    stats["PointMLP_4"] = s
    params["Dense_0"] = dense("final")
    return {"params": params, "batch_stats": stats}


def test_pointnet_partseg_logits_match_torch():
    torch.manual_seed(4)
    tnet = TorchPointNetSeg().eval()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 3, 64), torch.eye(16)[torch.arange(4)])
        tnet.eval()

    rng = np.random.default_rng(4)
    pts = rng.standard_normal((2, 96, 3)).astype(np.float32)
    onehot = np.eye(16, dtype=np.float32)[[3, 7]]
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts.transpose(0, 2, 1)),
                    torch.from_numpy(onehot)).numpy()

    model = get_seg_model("pointnet", part_num=50)
    variables = _convert(tnet)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(onehot),
                    training=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_pointnet_partseg_reference_checkpoint_import():
    """A state_dict with the reference's key scheme
    (stn/fstn.conv{i}/bn{i}/fc{i}, conv1..5/bn1..5, convs1..4/bns1..3
    — networks/seg/pointnet_partseg.py:14-37 with DEFAULT-bias convs)
    imports via interop.pointnet_partseg_from_reference; all the
    BN-redundant biases fold into the running means."""
    import re

    from pointcloudlib_tpu.utils.interop import (
        normalize_reference_keys,
        pointnet_partseg_from_reference,
    )

    torch.manual_seed(11)
    tnet = TorchPointNetSeg(part_num=50)

    def biased_conv(conv):
        nc = torch.nn.Conv1d(conv.in_channels, conv.out_channels, 1,
                             bias=True)
        with torch.no_grad():
            nc.weight.copy_(conv.weight)
        return nc

    def biased_linear(lin):
        nl = torch.nn.Linear(lin.in_features, lin.out_features,
                             bias=True)
        with torch.no_grad():
            nl.weight.copy_(lin.weight)
        return nl

    for mod in (tnet.stn, tnet.fstn):
        for i, c in enumerate(mod.convs):
            mod.convs[i] = biased_conv(c)
        mod.fc1 = biased_linear(mod.fc1)
        mod.fc2 = biased_linear(mod.fc2)
    for i, c in enumerate(tnet.convs):
        tnet.convs[i] = biased_conv(c)
    for i, c in enumerate(tnet.hconvs):
        tnet.hconvs[i] = biased_conv(c)
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 3, 64), torch.eye(16)[torch.arange(4)])
        tnet.eval()

    rng = np.random.default_rng(11)
    pts = rng.standard_normal((2, 96, 3)).astype(np.float32)
    onehot = np.eye(16, dtype=np.float32)[[3, 7]]
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts.transpose(0, 2, 1)),
                    torch.from_numpy(onehot)).numpy()

    sd = {}
    for k, v in tnet.state_dict().items():
        k = re.sub(r"^(stn|fstn)\.convs\.(\d+)\.",
                   lambda m: f"{m.group(1)}.conv{int(m.group(2)) + 1}.", k)
        k = re.sub(r"^(stn|fstn)\.cbns\.(\d+)\.",
                   lambda m: f"{m.group(1)}.bn{int(m.group(2)) + 1}.", k)
        k = re.sub(r"^(stn|fstn)\.fbn1\.", r"\1.bn4.", k)
        k = re.sub(r"^(stn|fstn)\.fbn2\.", r"\1.bn5.", k)
        k = re.sub(r"^convs\.(\d+)\.",
                   lambda m: f"conv{int(m.group(1)) + 1}.", k)
        k = re.sub(r"^bns\.(\d+)\.",
                   lambda m: f"bn{int(m.group(1)) + 1}.", k)
        k = re.sub(r"^hconvs\.(\d+)\.",
                   lambda m: f"convs{int(m.group(1)) + 1}.", k)
        k = re.sub(r"^hbns\.(\d+)\.",
                   lambda m: f"bns{int(m.group(1)) + 1}.", k)
        k = re.sub(r"^final\.", "convs4.", k)
        sd[k] = v.numpy()

    variables = pointnet_partseg_from_reference(
        normalize_reference_keys(sd))
    model = get_seg_model("pointnet", part_num=50)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(onehot),
                    training=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


class RefDGCNNPartSeg(torch.nn.Module):
    """Reference DGCNN_partseg module tree + semantics
    (networks/seg/dgcnn_partseg.py:36-130): conv1..10 =
    Sequential(bias-free Conv, BN, LeakyReLU(0.2)), bias-free conv11,
    feature-space kNN edge features (diff ‖ center)."""

    def __init__(self, part_num=50, k=8):
        super().__init__()
        self.k = k

        def seq2(cin, cout):
            return torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, bias=False),
                torch.nn.BatchNorm2d(cout),
                torch.nn.LeakyReLU(0.2))

        def seq1(cin, cout):
            return torch.nn.Sequential(
                torch.nn.Conv1d(cin, cout, 1, bias=False),
                torch.nn.BatchNorm1d(cout),
                torch.nn.LeakyReLU(0.2))

        self.conv1 = seq2(6, 64)
        self.conv2 = seq2(64, 64)
        self.conv3 = seq2(128, 64)
        self.conv4 = seq2(64, 64)
        self.conv5 = seq2(128, 64)
        self.conv6 = seq1(192, 1024)
        self.conv7 = seq1(16, 64)
        self.conv8 = seq1(1280, 256)
        self.conv9 = seq1(256, 256)
        self.conv10 = seq1(256, 128)
        self.conv11 = torch.nn.Conv1d(128, part_num, 1, bias=False)

    def _graph(self, x):  # [B, C, N] -> [B, 2C, N, k]
        d2 = torch.cdist(x.transpose(1, 2), x.transpose(1, 2)) ** 2
        idx = d2.topk(self.k, dim=-1, largest=False).indices  # [B,N,k]
        b, c, n = x.shape
        g = torch.gather(
            x.transpose(1, 2), 1,
            idx.reshape(b, -1, 1).expand(-1, -1, c)
        ).reshape(b, n, self.k, c)
        ctr = x.transpose(1, 2)[:, :, None].expand(-1, -1, self.k, -1)
        e = torch.cat([g - ctr, ctr], dim=-1)  # [B,N,k,2C]
        return e.permute(0, 3, 1, 2)

    def forward(self, x, label):  # [B, 3, N], [B, 16]
        b, _, n = x.shape
        h = self.conv2(self.conv1(self._graph(x)))
        x1 = h.max(dim=-1).values
        h = self.conv4(self.conv3(self._graph(x1)))
        x2 = h.max(dim=-1).values
        h = self.conv5(self._graph(x2))
        x3 = h.max(dim=-1).values
        g = self.conv6(torch.cat([x1, x2, x3], dim=1))
        g = g.max(dim=-1, keepdim=True).values
        l = self.conv7(label[:, :, None])
        g = torch.cat([g, l], dim=1).expand(-1, -1, n)
        h = torch.cat([g, x1, x2, x3], dim=1)
        h = self.conv10(self.conv9(self.conv8(h)))
        return self.conv11(h).transpose(1, 2)  # [B, N, parts]


def test_dgcnn_partseg_reference_checkpoint_import(monkeypatch):
    from pointcloudlib_tpu.nn import layers as L
    from pointcloudlib_tpu.utils.interop import (
        dgcnn_partseg_from_reference,
        normalize_reference_keys,
    )

    torch.manual_seed(13)
    tnet = RefDGCNNPartSeg(part_num=50, k=8)
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 3, 64), torch.eye(16)[torch.arange(4)])
        tnet.eval()

    rng = np.random.default_rng(13)
    pts = rng.standard_normal((2, 96, 3)).astype(np.float32)
    onehot = np.eye(16, dtype=np.float32)[[2, 9]]
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts.transpose(0, 2, 1)),
                    torch.from_numpy(onehot)).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = dgcnn_partseg_from_reference(
        normalize_reference_keys(sd))
    # the importer targets the unfused tree
    monkeypatch.setattr(L, "_fused_sa_enabled", lambda: False)
    model = get_seg_model("dgcnn", part_num=50, k=8)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(onehot),
                    training=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
