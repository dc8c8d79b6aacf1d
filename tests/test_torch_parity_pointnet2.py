"""Flagship parity: PointNet++ SSG vs an independent torch build.

The torch side reimplements FPS (seed 0, min-dist cache, near-origin
skip — reference misc/ops.py:114-286) and ball query
(first-k-in-index-order with repeat-first padding, misc/ops.py:289-407)
directly, plus the SA/MLP/head stack from networks/cls/pointnet2.py.
Same weights on both sides ⇒ logits must agree: any drift in sampling,
grouping, padding, pooling or head wiring fails the test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models import get_cls_model  # noqa: E402


def torch_fps(xyz, m):  # xyz [B, N, 3]
    b, n, _ = xyz.shape
    idx = torch.zeros(b, m, dtype=torch.long)
    mind = torch.full((b, n), 1e10)
    eligible = (xyz**2).sum(-1) > 1e-3
    last = torch.zeros(b, dtype=torch.long)
    for j in range(1, m):
        lastp = xyz[torch.arange(b), last]  # [B, 3]
        d = ((xyz - lastp[:, None]) ** 2).sum(-1)
        mind = torch.minimum(mind, d)
        score = torch.where(eligible, mind, torch.full_like(mind, -1.0))
        last = score.argmax(-1)
        idx[:, j] = last
    return idx


def torch_ball_query(centers, points, radius, k):
    """First-k-in-index-order ball query, repeat-first padding, rows
    with no hits -> index 0 (reference misc/ops.py:313-327 semantics).
    Vectorized (r4): the per-(b,m) python loop cost ~170 s/step at the
    MSG mirror-ladder shape; sorting the index-or-n key is exactly the
    loop's selection (first k in index order) with the same padding."""
    b, m, _ = centers.shape
    n = points.shape[1]
    d2 = torch.cdist(centers, points) ** 2
    mask = d2 < radius * radius
    pos = torch.where(mask, torch.arange(n)[None, None, :],
                      torch.tensor(n))
    sel = torch.sort(pos, dim=-1).values[..., :k]    # [b, m, k]
    valid = sel < n
    first = torch.where(valid[..., :1], sel[..., :1],
                        torch.zeros_like(sel[..., :1]))
    return torch.where(valid, sel, first)


class TorchSA(torch.nn.Module):
    def __init__(self, in_ch, mlp, n_points=None, radius=None, k=None):
        super().__init__()
        self.n_points, self.radius, self.k = n_points, radius, k
        chans = [in_ch + 3] + list(mlp)
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv2d(chans[i], chans[i + 1], 1, bias=False)
            for i in range(len(mlp))
        )
        self.bns = torch.nn.ModuleList(
            torch.nn.BatchNorm2d(c) for c in mlp
        )

    def forward(self, xyz, feats):  # [B,N,3], [B,N,C]
        if self.n_points is None:
            grouped = torch.cat([xyz, feats], -1)[:, None]  # [B,1,N,C+3]
            new_xyz = torch.zeros(xyz.shape[0], 1, 3)
        else:
            fi = torch_fps(xyz, self.n_points)
            new_xyz = torch.gather(
                xyz, 1, fi[..., None].expand(-1, -1, 3))
            ni = torch_ball_query(new_xyz, xyz, self.radius, self.k)
            flat = ni.reshape(ni.shape[0], -1)
            gx = torch.gather(
                xyz, 1, flat[..., None].expand(-1, -1, 3)
            ).reshape(*ni.shape, 3)
            gf = torch.gather(
                feats, 1, flat[..., None].expand(-1, -1, feats.shape[-1])
            ).reshape(*ni.shape, feats.shape[-1])
            local = gx - new_xyz[:, :, None]
            grouped = torch.cat([local, gf], -1)  # [B,M,K,3+C]
        h = grouped.permute(0, 3, 1, 2)  # [B,C,M,K]
        for conv, bn in zip(self.convs, self.bns):
            h = torch.relu(bn(conv(h)))
        return new_xyz, h.max(dim=-1).values.permute(0, 2, 1)  # [B,M,C']


class TorchPointNet2(torch.nn.Module):
    def __init__(self, n_classes=40):
        super().__init__()
        self.sa1 = TorchSA(3, [64, 64, 128], 512, 0.2, 64)
        self.sa2 = TorchSA(128, [128, 128, 256], 128, 0.4, 64)
        self.sa3 = TorchSA(256, [256, 512, 1024])
        self.linear1 = torch.nn.Linear(1024, 512, bias=False)
        self.bn1 = torch.nn.BatchNorm1d(512)
        self.linear2 = torch.nn.Linear(512, 256, bias=False)
        self.bn2 = torch.nn.BatchNorm1d(256)
        self.linear3 = torch.nn.Linear(256, n_classes)

    def forward(self, xyz, feats):
        xyz, f = self.sa1(xyz, feats)
        xyz, f = self.sa2(xyz, f)
        _, f = self.sa3(xyz, f)
        g = f[:, 0]
        g = torch.relu(self.bn1(self.linear1(g)))
        g = torch.relu(self.bn2(self.linear2(g)))
        return self.linear3(g)


def _variables_from(tnet):
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

    params, stats = {}, {}
    for si in range(3):
        mp, ms = {}, {}
        for li in range(3):
            bp, bs = bn(f"sa{si+1}.bns.{li}")
            mp[f"DenseBNAct_{li}"] = {
                "Dense_0": dense(f"sa{si+1}.convs.{li}"),
                "BatchNorm_0": bp,
            }
            ms[f"DenseBNAct_{li}"] = {"BatchNorm_0": bs}
        params[f"SetAbstraction_{si}"] = {"PointMLP_0": mp}
        stats[f"SetAbstraction_{si}"] = {"PointMLP_0": ms}
    hp, hs = {}, {}
    for li, (dname, bname) in enumerate([("linear1", "bn1"),
                                         ("linear2", "bn2")]):
        bp, bs = bn(bname)
        hp[f"DenseBNAct_{li}"] = {"Dense_0": dense(dname),
                                  "BatchNorm_0": bp}
        hs[f"DenseBNAct_{li}"] = {"BatchNorm_0": bs}
    hp["Dense_0"] = dense("linear3")
    params["_ClsHead_0"] = hp
    stats["_ClsHead_0"] = hs
    return {"params": params, "batch_stats": stats}


def test_pointnet2_logits_match_torch():
    torch.manual_seed(2)
    tnet = TorchPointNet2().eval()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 700, 3), torch.randn(4, 700, 3))
        tnet.eval()

    rng = np.random.default_rng(2)
    pts = rng.standard_normal((2, 700, 3)).astype(np.float32)
    nrm = rng.standard_normal((2, 700, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts), torch.from_numpy(nrm)).numpy()

    model = get_cls_model("pointnet2", n_classes=40)
    variables = _variables_from(tnet)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(nrm),
                    training=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


class RefKeyedSA(torch.nn.Module):
    """One reference PointnetModule(MSG): the EXACT module tree the
    reference checkpoints carry (networks/cls/pointnet2.py:65-98 —
    ``mlps.{g}`` = build_mlps Sequential(Conv, BN, ReLU) triplets),
    with the TorchSA grouping semantics for forward."""

    def __init__(self, in_ch, mlps, n_points=None, radii=None, ks=None):
        super().__init__()
        self.n_points, self.radii, self.ks = n_points, radii, ks
        self.mlps = torch.nn.ModuleList()
        for mlp in mlps:
            chans = [in_ch + 3] + list(mlp)
            layers = []
            for i in range(len(mlp)):
                layers += [
                    torch.nn.Conv2d(chans[i], chans[i + 1], 1, bias=False),
                    torch.nn.BatchNorm2d(chans[i + 1]),
                    torch.nn.ReLU(),
                ]
            self.mlps.append(torch.nn.Sequential(*layers))

    def forward(self, xyz, feats):
        if self.n_points is None:
            grouped = torch.cat([xyz, feats], -1)[:, None]
            return (torch.zeros(xyz.shape[0], 1, 3),
                    self._run(self.mlps[0], grouped))
        fi = torch_fps(xyz, self.n_points)
        new_xyz = torch.gather(xyz, 1, fi[..., None].expand(-1, -1, 3))
        outs = []
        for mlp, r, k in zip(self.mlps, self.radii, self.ks):
            ni = torch_ball_query(new_xyz, xyz, r, k)
            flat = ni.reshape(ni.shape[0], -1)
            gx = torch.gather(
                xyz, 1, flat[..., None].expand(-1, -1, 3)
            ).reshape(*ni.shape, 3)
            gf = torch.gather(
                feats, 1, flat[..., None].expand(-1, -1, feats.shape[-1])
            ).reshape(*ni.shape, feats.shape[-1])
            grouped = torch.cat([gx - new_xyz[:, :, None], gf], -1)
            outs.append(self._run(mlp, grouped))
        return new_xyz, torch.cat(outs, -1)

    @staticmethod
    def _run(mlp, grouped):  # [B,M,K,C] -> [B,M,C']
        h = mlp(grouped.permute(0, 3, 1, 2))
        return h.max(dim=-1).values.permute(0, 2, 1)


class RefKeyedPointNet2(torch.nn.Module):
    """Reference PointNet2_cls / PointNetMSG module tree
    (pointnet_modules + fc_layer, networks/cls/pointnet2.py:101-188)."""

    def __init__(self, n_classes=40, msg=False):
        super().__init__()
        if msg:
            mods = [
                RefKeyedSA(3, [[32, 32, 64], [64, 64, 128], [64, 96, 128]],
                           512, [0.1, 0.2, 0.4], [16, 32, 128]),
                RefKeyedSA(320, [[64, 64, 128], [128, 128, 256],
                                 [128, 128, 256]],
                           128, [0.2, 0.4, 0.8], [32, 64, 128]),
                RefKeyedSA(640, [[256, 512, 1024]]),
            ]
        else:
            mods = [
                RefKeyedSA(3, [[64, 64, 128]], 512, [0.2], [64]),
                RefKeyedSA(128, [[128, 128, 256]], 128, [0.4], [64]),
                RefKeyedSA(256, [[256, 512, 1024]]),
            ]
        self.pointnet_modules = torch.nn.ModuleList(mods)
        self.fc_layer = torch.nn.Sequential(
            torch.nn.Linear(1024, 512, bias=False),
            torch.nn.BatchNorm1d(512),
            torch.nn.ReLU(),
            torch.nn.Linear(512, 256, bias=False),
            torch.nn.BatchNorm1d(256),
            torch.nn.ReLU(),
            torch.nn.Dropout(0.5),
            torch.nn.Linear(256, n_classes),
        )

    def forward(self, xyz, feats):
        for m in self.pointnet_modules:
            xyz, feats = m(xyz, feats)
        return self.fc_layer(feats[:, 0])


@pytest.mark.parametrize("msg", [False, True])
def test_pointnet2_reference_checkpoint_import(msg):
    """A state_dict with the reference's own key scheme imports via
    interop.pointnet2_from_reference and reproduces the logits —
    including through normalize_reference_keys with jittor-style
    ``.layers`` path segments injected."""
    from pointcloudlib_tpu.utils.interop import (
        normalize_reference_keys,
        pointnet2_from_reference,
    )

    torch.manual_seed(4)
    tnet = RefKeyedPointNet2(msg=msg).eval()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 512, 3), torch.randn(4, 512, 3))
        tnet.eval()

    rng = np.random.default_rng(4)
    pts = rng.standard_normal((2, 512, 3)).astype(np.float32)
    nrm = rng.standard_normal((2, 512, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts), torch.from_numpy(nrm)).numpy()

    # jittor-style keys: Sequential/ModuleList children under .layers
    sd = {}
    for k, v in tnet.state_dict().items():
        parts = []
        for seg in k.split("."):
            if seg.isdigit():
                parts.append(f"layers.{seg}")
            else:
                parts.append(seg)
        sd[".".join(parts)] = v.numpy()

    variables = pointnet2_from_reference(
        normalize_reference_keys(sd), msg=msg)
    model = get_cls_model("pointnet2_msg" if msg else "pointnet2",
                          n_classes=40)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(nrm),
                    training=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


class RefFP(torch.nn.Module):
    """Reference PointNetFeaturePropagation (misc/ops.py:54-107):
    3-NN inverse-square-distance upsampling (eps 1e-8) + skip concat +
    Conv1d(bias)/BN/ReLU stack under mlp_convs/mlp_bns."""

    def __init__(self, in_ch, mlp):
        super().__init__()
        chans = [in_ch] + list(mlp)
        self.mlp_convs = torch.nn.ModuleList(
            torch.nn.Conv1d(chans[i], chans[i + 1], 1)
            for i in range(len(mlp)))
        self.mlp_bns = torch.nn.ModuleList(
            torch.nn.BatchNorm1d(c) for c in mlp)

    def forward(self, xyz1, xyz2, f1, f2):
        if xyz2.shape[1] == 1:
            up = f2.expand(-1, xyz1.shape[1], -1)
        else:
            d2 = torch.cdist(xyz1, xyz2) ** 2
            d2, idx = d2.topk(3, dim=-1, largest=False)
            w = 1.0 / (d2 + 1e-8)
            w = w / w.sum(-1, keepdim=True)
            g = torch.gather(
                f2, 1, idx.reshape(idx.shape[0], -1, 1).expand(
                    -1, -1, f2.shape[-1])
            ).reshape(*idx.shape, f2.shape[-1])
            up = (g * w[..., None]).sum(2)
        h = torch.cat([f1, up], -1) if f1 is not None else up
        h = h.transpose(1, 2)
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            h = torch.relu(bn(conv(h)))
        return h.transpose(1, 2)


class RefKeyedPointNet2PartSeg(torch.nn.Module):
    """Reference PointNet2_partseg module tree
    (networks/seg/pointnet2_partseg.py:110-157)."""

    def __init__(self, part_num=8):
        super().__init__()
        self.pointnet_modules = torch.nn.ModuleList([
            RefKeyedSA(3, [[64, 64, 128]], 128, [0.2], [32]),
            RefKeyedSA(128, [[128, 128, 256]], 32, [0.4], [32]),
            RefKeyedSA(256, [[256, 512, 1024]]),
        ])
        self.fp3 = RefFP(1280, [256, 256])
        self.fp2 = RefFP(384, [256, 128])
        self.fp1 = RefFP(128 + 16 + 6, [128, 128, 128])
        self.fc_layer = torch.nn.Sequential(
            torch.nn.Conv1d(128, 128, 1),
            torch.nn.BatchNorm1d(128),
            torch.nn.Dropout(0.5),
            torch.nn.Conv1d(128, part_num, 1),
        )

    def forward(self, xyz, feats, label):
        b, n, _ = xyz.shape
        l1x, l1f = self.pointnet_modules[0](xyz, feats)
        l2x, l2f = self.pointnet_modules[1](l1x, l1f)
        l3x, l3f = self.pointnet_modules[2](l2x, l2f)
        l2f = self.fp3(l2x, l3x, l2f, l3f)
        l1f = self.fp2(l1x, l2x, l1f, l2f)
        onehot = label[:, None, :].expand(-1, n, -1)
        f = self.fp1(xyz, l1x,
                     torch.cat([onehot, xyz, feats], -1), l1f)
        return self.fc_layer(f.transpose(1, 2)).transpose(1, 2)


def test_pointnet2_partseg_reference_checkpoint_import():
    from pointcloudlib_tpu.models import get_seg_model
    from pointcloudlib_tpu.utils.interop import (
        normalize_reference_keys,
        pointnet2_partseg_from_reference,
    )

    torch.manual_seed(9)
    tnet = RefKeyedPointNet2PartSeg(part_num=8).eval()
    lab = torch.nn.functional.one_hot(
        torch.arange(4) % 16, 16).float()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 256, 3), torch.randn(4, 256, 3), lab)
        tnet.eval()

    rng = np.random.default_rng(9)
    pts = rng.standard_normal((2, 256, 3)).astype(np.float32)
    nrm = rng.standard_normal((2, 256, 3)).astype(np.float32)
    lab2 = np.eye(16, dtype=np.float32)[np.arange(2) % 16]
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts), torch.from_numpy(nrm),
                    torch.from_numpy(lab2)).numpy()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = pointnet2_partseg_from_reference(
        normalize_reference_keys(sd))
    model = get_seg_model("pointnet2", part_num=8)
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), jnp.asarray(lab2),
                    jnp.asarray(nrm), training=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
