"""The activation-diff tool (utils/actdiff.py) — the reference audits
cross-framework ports by hooking every module and diffing activations
at runtime (train_cls.py:330-361); this is our analogue, so the test
drives the REAL cross-framework pair: torch PointNet vs ours with
copied weights, streams captured on both sides."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models import get_cls_model  # noqa: E402
from pointcloudlib_tpu.utils import actdiff  # noqa: E402
from pointcloudlib_tpu.utils.interop import pointnet_from_torch  # noqa: E402
from tests.test_torch_parity import TorchPointNet  # noqa: E402


def _streams(corrupt=False):
    torch.manual_seed(0)
    tnet = TorchPointNet().eval()
    with torch.no_grad():
        tnet.train()
        tnet(torch.randn(8, 3, 64))
        tnet.eval()

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    x = torch.from_numpy(pts.transpose(0, 2, 1))
    with torch.no_grad():
        theirs = actdiff.capture_torch(tnet, lambda m: m(x))

    variables = pointnet_from_torch(
        {k: v.numpy() for k, v in tnet.state_dict().items()})
    if corrupt:
        # flip one conv kernel: every downstream module must mismatch
        mlp = variables["params"]["PointMLP_0"]["DenseBNAct_1"]
        mlp["Dense_0"]["kernel"] = -mlp["Dense_0"]["kernel"]
    model = get_cls_model("pointnet", n_classes=40)
    ours = actdiff.capture_jax(
        model, variables, jnp.asarray(pts), None, training=False)
    return ours, theirs


def test_matched_checkpoint_diffs_clean():
    ours, theirs = _streams()
    rows = actdiff.diff(ours, theirs, atol=1e-3)
    matched = [r for r in rows if r.get("max_abs") is not None]
    # the streams have different granularity (our DenseBNAct fuses
    # conv+bn+relu; torch records each) — but the big shared
    # activations must align and agree
    assert len(matched) >= 8
    bad = [r for r in matched if not r["ok"]]
    assert not bad, actdiff.format_table(bad)
    # the final logits [B, 40] must be among the matches
    assert any(r["shape"] == (2, 40) for r in matched)
    # table renders
    assert "max|Δ|" in actdiff.format_table(rows)


def test_corrupted_checkpoint_flagged():
    ours, theirs = _streams(corrupt=True)
    rows = actdiff.diff(ours, theirs, atol=1e-3)
    bad = [r for r in rows if r.get("ok") is False]
    assert bad, "corrupted weights must produce MISMATCH rows"
    assert any(r["shape"] == (2, 40) for r in bad)


def test_trace_roundtrip(tmp_path):
    ours, _ = _streams()
    path = str(tmp_path / "trace.npz")
    actdiff.save_trace(path, ours)
    back = actdiff.load_trace(path)
    assert [n for n, _ in back] == [n for n, _ in ours]
    for (_, a), (_, b) in zip(back, ours):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_diff_checkpoint_cli_entry(tmp_path):
    """The CLI path end to end: torch checkpoint file -> importer ->
    capture -> diff against a recorded torch trace."""
    torch.manual_seed(1)
    tnet = TorchPointNet().eval()
    ck = str(tmp_path / "ck.pt")
    torch.save({"model_state_dict": tnet.state_dict()}, ck)

    rng = np.random.default_rng(1)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    x = torch.from_numpy(pts.transpose(0, 2, 1))
    with torch.no_grad():
        theirs = actdiff.capture_torch(tnet, lambda m: m(x))
    trace = str(tmp_path / "torch.npz")
    actdiff.save_trace(trace, theirs)

    items = actdiff.diff_checkpoint(
        "pointnet", "cls", ck, pts, trace=trace,
        dump=str(tmp_path / "ours.npz"))
    assert len(items) >= 8
    assert (tmp_path / "ours.npz").exists()
