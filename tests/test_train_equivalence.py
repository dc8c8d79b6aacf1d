"""Cross-framework TRAINING equivalence: several SGD steps of our
PointNet vs an independent torch implementation from the same init on
the same batches must produce the same loss trajectory, parameters,
and BN running statistics.

Forward-logits parity (test_torch_parity.py) validates architecture;
this validates the whole training loop — gradients, label-smoothed CE
(train_cls.py:31-50 semantics), SGD+momentum (train_cls.py:404), and
the BN running-stat update rule — end to end. This is the strongest
accuracy evidence available in a zero-egress environment
(docs/ACCURACY.md).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models import get_cls_model  # noqa: E402
from pointcloudlib_tpu.train import (  # noqa: E402
    create_train_state,
    make_cls_train_step,
    sgd_momentum,
)
from pointcloudlib_tpu.utils.interop import pointnet_from_torch  # noqa: E402
from tests.test_torch_parity import TorchPointNet  # noqa: E402

LR, MOM, EPS = 0.01, 0.9, 0.2
B, N, STEPS = 8, 64, 5


def _torch_soft_ce(logits, labels, n_class=40):
    """The reference's smoothing: true 1-eps, others eps/(K-1)
    (train_cls.py:31-50)."""
    one_hot = torch.nn.functional.one_hot(labels, n_class).float()
    soft = one_hot * (1 - EPS) + (1 - one_hot) * (EPS / (n_class - 1))
    logp = torch.nn.functional.log_softmax(logits, dim=-1)
    return -(soft * logp).sum(-1).mean()


def test_pointnet_training_matches_torch():
    torch.manual_seed(0)
    tnet = TorchPointNet()
    tnet.train()
    opt = torch.optim.SGD(tnet.parameters(), lr=LR, momentum=MOM)

    rng = np.random.default_rng(0)
    batches = [
        (
            rng.standard_normal((B, N, 3)).astype(np.float32),
            rng.integers(0, 40, (B,)).astype(np.int64),
        )
        for _ in range(STEPS)
    ]

    t_losses = []
    for pts, lbl in batches:
        opt.zero_grad()
        out = tnet(torch.from_numpy(pts.transpose(0, 2, 1)))
        loss = _torch_soft_ce(out, torch.from_numpy(lbl))
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    # ours: same init (copied), dropout disabled on both sides (the
    # torch reference impl has no dropout module; rate=0 here)
    model = get_cls_model("pointnet", n_classes=40, dropout=0.0)
    torch.manual_seed(0)
    tinit = TorchPointNet()
    variables = pointnet_from_torch(
        {k: v.numpy() for k, v in tinit.state_dict().items()}
    )
    tx = sgd_momentum(lambda _: LR, momentum=MOM)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, N, 3)), None, tx
    )
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    step = make_cls_train_step(model, mesh=None)

    j_losses = []
    for pts, lbl in batches:
        batch = {"xyz": jnp.asarray(pts),
                 "label": jnp.asarray(lbl.astype(np.int32))}
        state, metrics = step(state, batch, jax.random.key(1))
        j_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-4)

    # parameters after training agree (spot: first conv + head kernel)
    tsd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    got_w1 = np.asarray(
        jax.tree_util.tree_leaves(
            state.params["PointMLP_0"]["DenseBNAct_0"]["Dense_0"]["kernel"]
        )[0]
    )
    want_w1 = tsd["conv1.weight"][:, :, 0].T  # [3, 64]
    np.testing.assert_allclose(got_w1, want_w1, rtol=1e-3, atol=2e-4)

    got_head = np.asarray(state.params["Dense_0"]["kernel"])
    np.testing.assert_allclose(
        got_head, tsd["linear2.weight"].T, rtol=1e-3, atol=2e-4
    )

    # BN running statistics follow the same update rule
    got_rm = np.asarray(
        state.batch_stats["PointMLP_0"]["DenseBNAct_0"]["BatchNorm_0"][
            "mean"
        ]
    )
    np.testing.assert_allclose(
        got_rm, tsd["bn1.running_mean"], rtol=1e-3, atol=2e-4
    )
