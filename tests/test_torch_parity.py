"""Cross-framework numerical parity: torch PointNet vs ours.

The reference verifies against PyTorch via an activation-diff hook
(auto_diff, train_cls.py:330-361). Here: define the reference PointNet
independently in torch (CPU), copy the same random weights into our
flax model through utils.interop, and require the LOGITS to match —
end-to-end architectural parity, not just shape parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models import get_cls_model  # noqa: E402
from pointcloudlib_tpu.utils.interop import (  # noqa: E402
    dgcnn_from_torch,
    pointnet_from_torch,
)


class TorchPointNet(torch.nn.Module):
    """The reference architecture (networks/cls/pointnet.py:9-40),
    written against torch directly."""

    def __init__(self, n_classes=40):
        super().__init__()
        dims = [3, 64, 64, 64, 128, 1024]
        for i in range(5):
            setattr(self, f"conv{i+1}",
                    torch.nn.Conv1d(dims[i], dims[i + 1], 1, bias=False))
            setattr(self, f"bn{i+1}", torch.nn.BatchNorm1d(dims[i + 1]))
        self.linear1 = torch.nn.Linear(1024, 512, bias=False)
        self.bn6 = torch.nn.BatchNorm1d(512)
        self.linear2 = torch.nn.Linear(512, n_classes)

    def forward(self, x):  # x [B, 3, N]
        for i in range(5):
            x = getattr(self, f"conv{i+1}")(x)
            x = getattr(self, f"bn{i+1}")(x)
            x = torch.relu(x)
        x = torch.max(x, dim=2).values
        x = torch.relu(self.bn6(self.linear1(x)))
        return self.linear2(x)


def test_pointnet_logits_match_torch():
    torch.manual_seed(0)
    tnet = TorchPointNet().eval()
    # make running stats non-trivial: one train-mode pass
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(8, 3, 64))
        tnet.eval()

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((4, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()

    model = get_cls_model("pointnet", n_classes=40)
    variables = pointnet_from_torch(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), None, training=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


class TorchDGCNN(torch.nn.Module):
    """Reference DGCNN cls (networks/cls/dgcnn.py:61-122) in torch."""

    def __init__(self, n_classes=40, k=20):
        super().__init__()
        self.k = k
        chans = [(6, 64), (128, 64), (128, 128), (256, 256)]
        for i, (cin, cout) in enumerate(chans):
            setattr(self, f"conv{i+1}",
                    torch.nn.Conv2d(cin, cout, 1, bias=False))
            setattr(self, f"bn{i+1}", torch.nn.BatchNorm2d(cout))
        self.conv5 = torch.nn.Conv1d(512, 1024, 1, bias=False)
        self.bn5 = torch.nn.BatchNorm1d(1024)
        self.linear1 = torch.nn.Linear(2048, 512, bias=False)
        self.bn6 = torch.nn.BatchNorm1d(512)
        self.linear2 = torch.nn.Linear(512, 256)
        self.bn7 = torch.nn.BatchNorm1d(256)
        self.linear3 = torch.nn.Linear(256, n_classes)

    def _graph_feature(self, x):  # x [B, C, N]
        b, c, n = x.shape
        d = torch.cdist(x.transpose(1, 2), x.transpose(1, 2)) ** 2
        idx = d.topk(self.k, dim=-1, largest=False).indices  # [B, N, k]
        pts = x.transpose(1, 2)  # [B, N, C]
        nbr = torch.gather(
            pts.unsqueeze(1).expand(b, n, n, c), 2,
            idx.unsqueeze(-1).expand(b, n, self.k, c),
        )
        ctr = pts.unsqueeze(2).expand(b, n, self.k, c)
        e = torch.cat([nbr - ctr, ctr], dim=-1)  # [B, N, k, 2C]
        return e.permute(0, 3, 1, 2)  # [B, 2C, N, k]

    def forward(self, x):  # [B, 3, N]
        feats = []
        h = x
        for i in range(4):
            e = self._graph_feature(h)
            e = torch.nn.functional.leaky_relu(
                getattr(self, f"bn{i+1}")(getattr(self, f"conv{i+1}")(e)),
                0.2,
            )
            h = e.max(dim=-1).values  # [B, C, N]
            feats.append(h)
        z = torch.cat(feats, dim=1)  # [B, 512, N]
        z = torch.nn.functional.leaky_relu(self.bn5(self.conv5(z)), 0.2)
        g = torch.cat([z.max(dim=2).values, z.mean(dim=2)], dim=1)
        g = torch.nn.functional.leaky_relu(self.bn6(self.linear1(g)), 0.2)
        g = torch.nn.functional.leaky_relu(self.bn7(self.linear2(g)), 0.2)
        return self.linear3(g)


def test_dgcnn_logits_match_torch():
    torch.manual_seed(1)
    tnet = TorchDGCNN().eval()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(4, 3, 64))
        tnet.eval()

    rng = np.random.default_rng(1)
    pts = rng.standard_normal((2, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(pts.transpose(0, 2, 1))).numpy()

    model = get_cls_model("dgcnn", n_classes=40)
    variables = dgcnn_from_torch(
        {k: v.numpy() for k, v in tnet.state_dict().items()}
    )
    got = np.asarray(
        model.apply(variables, jnp.asarray(pts), None, training=False)
    )
    # kNN neighbor ORDER may differ between frameworks but EdgeConv
    # max-pools over neighbors, so logits must still agree
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)
