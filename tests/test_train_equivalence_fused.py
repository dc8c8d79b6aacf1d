"""Cross-framework training equivalence for the FUSED Pallas path.

test_train_equivalence.py proves the unfused training loop matches an
independent torch implementation step for step (f32 vs f32 — exact).
The fused SA kernels are *designed* mixed-precision (bf16 gather
operands, bf16 h checkpoints, bf16 MXU matmuls), so exact full-model
trajectory parity with a f32 torch replica is mathematically
unattainable: ~1% forward noise flips max-pool argmax selections, which
reroutes gradients row-by-row through three stacked SA layers (both
sides compute valid subgradients of nearly identical functions, but
their difference decorrelates with depth — measured in round 2:
single-SA grad cosine vs unfused ≈ 0.995, full-model ≈ 0.1 with
matched loss descent).

So the fused path's cross-framework evidence is structured in layers:

1. kernel VJP == jax AD of a rounding-identical replica
   (test_fused_sa.py, test_fused_edge.py) — exact;
2. THIS FILE (a): one fused SA *module* at the production SA1 config vs
   an independent torch SA — forward, parameter gradients, and BN batch
   stats agree to bf16 tolerance (the composition boundary where exact
   comparison is still meaningful);
3. THIS FILE (b): the full fused model and the torch model descend
   together on a repeated batch from a shared init — the statistical
   equivalence that actually predicts matched training curves.

Replaces the reference's auto_diff hook (train_cls.py:330-361) for the
path that actually ships.
"""

import os

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
from pointcloudlib_tpu.utils.interop import convert_variables  # noqa: E402
from tests.test_torch_parity_pointnet2 import (  # noqa: E402
    TorchPointNet2,
    TorchSA,
    _variables_from,
)
from tests.test_train_equivalence import _torch_soft_ce  # noqa: E402

B, N = 2, 700


def _cos(a, b):
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    return float(a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _ratio(a, b):
    return float(np.linalg.norm(np.asarray(a)) /
                 (np.linalg.norm(np.asarray(b)) + 1e-12))


@pytest.mark.parametrize("cap_gather", ["0", "1"],
                         ids=["tail-capped", "gather-capped"])
def test_fused_sa_module_grads_match_torch(cap_gather, monkeypatch):
    """One fused SA at the production SA1 config (512 centers, r=0.2,
    k=64, mlp 64/64/128) vs an independent torch SA from shared
    weights: outputs, all parameter gradients, and the BN batch moments
    must agree to bf16-path tolerance.

    N=700 puts the layer on the external-idx fused route with the ball
    query's cnt fed through, so the slot-capped cond chain runs here —
    and with POINTCLOUDLIB_CAP_GATHER=1, the capped gather pass too:
    torch-independent evidence for both capping variants."""
    monkeypatch.setenv("POINTCLOUDLIB_SA_RUNGS", "1")  # rungs are opt-in
    monkeypatch.setenv("POINTCLOUDLIB_CAP_GATHER", cap_gather)
    torch.manual_seed(1)
    tsa = TorchSA(3, [64, 64, 128], 512, 0.2, 64)
    tsa.train()

    rng = np.random.default_rng(1)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    nrm = rng.standard_normal((B, N, 3)).astype(np.float32)
    co = rng.standard_normal((B, 512, 128)).astype(np.float32)

    # torch forward + backward
    tp = torch.from_numpy(pts).requires_grad_(False)
    tn = torch.from_numpy(nrm)
    _, tout = tsa(tp, tn)
    (tout * torch.from_numpy(co)).sum().backward()
    t_grads = {n: p.grad.detach().numpy() for n, p in
               tsa.named_parameters()}

    # ours, fused path forced, same weights
    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    try:
        from pointcloudlib_tpu.nn.layers import SetAbstraction

        model = SetAbstraction(mlp=(64, 64, 128), n_points=512,
                               radius=0.2, n_samples=64)
        tmpl = model.init(jax.random.key(0), jnp.asarray(pts),
                          jnp.asarray(nrm), True)
        sd = {k: v.detach().numpy() for k, v in tsa.state_dict().items()}
        fused_p = {"FusedSetAbstraction_0": {}}
        fl = fused_p["FusedSetAbstraction_0"]
        for i in (1, 2, 3):
            fl[f"w{i}"] = jnp.asarray(
                sd[f"convs.{i-1}.weight"][..., 0, 0].T)
            fl[f"bn{i}_scale"] = jnp.asarray(sd[f"bns.{i-1}.weight"])
            fl[f"bn{i}_bias"] = jnp.asarray(sd[f"bns.{i-1}.bias"])

        def lf(p):
            (_, out), mut = model.apply(
                {"params": p, "batch_stats": tmpl["batch_stats"]},
                jnp.asarray(pts), jnp.asarray(nrm), True,
                mutable=["batch_stats"])
            return jnp.sum(out * jnp.asarray(co)), (out, mut)

        (_, (out, mut)), g = jax.value_and_grad(
            lf, has_aux=True)(fused_p)
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]

    # forward parity (bf16 path ≈1% of activation scale)
    scale = float(np.abs(tout.detach().numpy()).max())
    np.testing.assert_allclose(
        np.asarray(out), tout.detach().numpy().reshape(B, 512, 128),
        atol=0.03 * scale)

    # gradient parity per leaf
    gl = g["FusedSetAbstraction_0"]
    for i in (1, 2, 3):
        pairs = [
            (gl[f"w{i}"], t_grads[f"convs.{i-1}.weight"][..., 0, 0].T),
            (gl[f"bn{i}_scale"], t_grads[f"bns.{i-1}.weight"]),
            (gl[f"bn{i}_bias"], t_grads[f"bns.{i-1}.bias"]),
        ]
        for a, b in pairs:
            assert _cos(a, b) > 0.98, (i, _cos(a, b))
            assert 0.9 < _ratio(a, b) < 1.1, (i, _ratio(a, b))

    # BN batch moments reach the running stats with the same update
    # rule (torch momentum 0.1 == flax momentum 0.9 complement)
    tsd = {k: v.detach().numpy() for k, v in tsa.state_dict().items()}
    got_rm = np.asarray(
        mut["batch_stats"]["FusedSetAbstraction_0"]["mean1"])
    np.testing.assert_allclose(got_rm, tsd["bns.0.running_mean"],
                               rtol=0.05, atol=5e-3)
    got_rv = np.asarray(
        mut["batch_stats"]["FusedSetAbstraction_0"]["var3"])
    np.testing.assert_allclose(got_rv, tsd["bns.2.running_var"],
                               rtol=0.05, atol=5e-3)


def test_pointnet2_fused_training_descends_with_torch():
    """Full fused model vs the torch replica from a shared init on one
    repeated batch: both must descend decisively, ending within a band
    of each other. A systematically wrong fused gradient (wrong scale,
    dropped term, stale BN sums — every defect class the round-1 psum
    bug exemplified) fails this immediately; bf16-induced argmax
    rerouting does not (see module docstring)."""
    LR, MOM, STEPS = 3e-3, 0.9, 8

    torch.manual_seed(4)
    tnet = TorchPointNet2()
    tnet.train()
    opt = torch.optim.SGD(tnet.parameters(), lr=LR, momentum=MOM)

    rng = np.random.default_rng(4)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    nrm = rng.standard_normal((B, N, 3)).astype(np.float32)
    lbl = rng.integers(0, 40, (B,)).astype(np.int64)

    t_losses = []
    for _ in range(STEPS):
        opt.zero_grad()
        out = tnet(torch.from_numpy(pts), torch.from_numpy(nrm))
        loss = _torch_soft_ce(out, torch.from_numpy(lbl))
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    os.environ["POINTCLOUDLIB_FUSED_SA"] = "1"
    try:
        model = get_cls_model("pointnet2", n_classes=40, dropout=0.0)
        tmpl = model.init(jax.random.key(0), jnp.zeros((1, N, 3)),
                          jnp.zeros((1, N, 3)), True)
        torch.manual_seed(4)
        fused_v = convert_variables(
            _variables_from(TorchPointNet2()), tmpl)
        tx = sgd_momentum(lambda _: LR, momentum=MOM)
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, N, 3)),
            jnp.zeros((1, N, 3)), tx)
        state = state.replace(params=fused_v["params"],
                              batch_stats=fused_v["batch_stats"])
        step = make_cls_train_step(model, mesh=None)
        batch = {"xyz": jnp.asarray(pts), "feats": jnp.asarray(nrm),
                 "label": jnp.asarray(lbl.astype(np.int32))}
        j_losses = []
        for _ in range(STEPS):
            state, metrics = step(state, batch, jax.random.key(1))
            j_losses.append(float(metrics["loss"]))
    finally:
        del os.environ["POINTCLOUDLIB_FUSED_SA"]

    assert all(np.isfinite(j_losses)), j_losses
    # shared init: first losses match to the bf16 forward band
    np.testing.assert_allclose(j_losses[0], t_losses[0], rtol=0.05)
    # both descend decisively on the repeated batch
    assert t_losses[-1] < t_losses[0] - 0.3, t_losses
    assert j_losses[-1] < j_losses[0] - 0.3, j_losses
    # and end up in the same neighborhood
    assert abs(j_losses[-1] - t_losses[-1]) < 0.25 * t_losses[0], (
        j_losses, t_losses)
