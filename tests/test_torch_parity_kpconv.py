"""KPConv operator parity vs an independent torch implementation.

The torch replica follows the reference stacked/shadow-point formulation
(networks/cls/blocks.py:125-359): append a 1e6 shadow support row +
zero shadow feature, gather neighbors, distances to (optionally
deformed + modulated) kernel points, influence weights, per-kernel-point
weight matmul. Our KPConvOp instead uses dense batched masks — this test
proves the two formulations agree to f32 precision for every
influence/aggregation/deformable combination, and that the sown
regularizer equals p2p_fitting_regularizer (kpconv.py:12-45).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointcloudlib_tpu.models.kpconv.kernel_points import (  # noqa: E402
    load_kernels,
)
from pointcloudlib_tpu.models.kpconv.model import KPConvOp  # noqa: E402

B, M, N, K, P = 2, 24, 48, 10, 15
C_IN, C_OUT = 5, 7
RADIUS, EXTENT = 1.0, 0.6


def torch_kpconv(q, s, x, idx, kp, w, influence, aggregation,
                 offsets=None, modulations=None):
    """One cloud, reference stacked formulation (blocks.py:255-355)."""
    n = s.shape[0]
    s_pad = torch.cat([s, torch.full((1, 3), 1e6)], 0)
    nbr = s_pad[idx] - q[:, None, :]                 # [M, K, 3]
    kpts = kp[None] if offsets is None else kp[None] + offsets  # [M?,P,3]
    diff = nbr[:, :, None, :] - kpts[:, None, :, :]
    d2 = (diff ** 2).sum(-1)                         # [M, K, P]

    if influence == "constant":
        aw = torch.ones_like(d2)
    elif influence == "linear":
        aw = torch.clamp(1 - torch.sqrt(d2) / EXTENT, min=0.0)
    else:
        sigma = EXTENT * 0.3
        aw = torch.exp(-d2 / (2 * sigma * sigma))
    aw = aw.transpose(1, 2)                          # [M, P, K]
    if aggregation == "closest":
        nn1 = d2.argmin(-1)                          # [M, K]
        aw = aw * torch.nn.functional.one_hot(nn1, P).transpose(1, 2)
    x_pad = torch.cat([x, torch.zeros(1, x.shape[-1])], 0)
    nx = x_pad[idx]                                  # [M, K, C]
    wf = torch.matmul(aw, nx)                        # [M, P, C]
    if modulations is not None:
        wf = wf * modulations[:, :, None]
    out = torch.einsum("mpc,pcd->md", wf, w)
    min_d2 = d2.min(1).values                        # [M, P]
    return out, min_d2, kpts.expand(q.shape[0], P, 3)


def _setup(seed):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, M, 3)).astype(np.float32)
    s = rng.standard_normal((B, N, 3)).astype(np.float32)
    x = rng.standard_normal((B, N, C_IN)).astype(np.float32)
    idx = rng.integers(0, N, (B, M, K)).astype(np.int32)
    # sentinel tail like real pyramids (ensure >=1 valid per row)
    nvalid = rng.integers(1, K + 1, (B, M))
    ar = np.arange(K)
    nmask = ar[None, None] < nvalid[..., None]
    idx = np.where(nmask, idx, N)
    w = (rng.standard_normal((P, C_IN, C_OUT)) * 0.2).astype(np.float32)
    kp = load_kernels(RADIUS, P)
    return q, s, x, idx, nmask, w, kp


@pytest.mark.parametrize("influence,aggregation", [
    ("linear", "sum"),
    ("gaussian", "closest"),
    ("constant", "sum"),
])
def test_rigid_kpconv_matches_torch(influence, aggregation):
    q, s, x, idx, nmask, w, kp = _setup(0)

    op = KPConvOp(out_dim=C_OUT, radius=RADIUS, kp_extent=EXTENT,
                  num_kpoints=P, influence=influence,
                  aggregation=aggregation)
    variables = {"params": {"weights": jnp.asarray(w)}}
    got = np.asarray(op.apply(
        variables, jnp.asarray(q), jnp.asarray(s), jnp.asarray(x),
        jnp.asarray(idx), jnp.asarray(nmask)))

    tkp = torch.from_numpy(kp)
    tw = torch.from_numpy(w)
    for b in range(B):
        want, _, _ = torch_kpconv(
            torch.from_numpy(q[b]), torch.from_numpy(s[b]),
            torch.from_numpy(x[b]), torch.from_numpy(idx[b]).long(),
            tkp, tw, influence, aggregation)
        np.testing.assert_allclose(got[b], want.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_deformable_modulated_matches_torch():
    q, s, x, idx, nmask, w, kp = _setup(1)
    rng = np.random.default_rng(2)
    w_off = (rng.standard_normal((P, C_IN, 4 * P)) * 0.1).astype(np.float32)
    off_bias = (rng.standard_normal(4 * P) * 0.1).astype(np.float32)

    op = KPConvOp(out_dim=C_OUT, radius=RADIUS, kp_extent=EXTENT,
                  num_kpoints=P, influence="linear", aggregation="sum",
                  deformable=True, modulated=True)
    variables = {"params": {
        "weights": jnp.asarray(w),
        "offset_bias": jnp.asarray(off_bias),
        "offset_conv": {"weights": jnp.asarray(w_off)},
    }}
    got, mut = op.apply(
        variables, jnp.asarray(q), jnp.asarray(s), jnp.asarray(x),
        jnp.asarray(idx), jnp.asarray(nmask),
        mutable=["intermediates"])
    got = np.asarray(got)
    reg_got = float(jnp.sum(
        jax.tree_util.tree_leaves(mut["intermediates"])[0]))

    tkp = torch.from_numpy(kp)
    tw = torch.from_numpy(w)
    tw_off = torch.from_numpy(w_off)
    fit_terms, rep_terms = [], []
    for b in range(B):
        tq, ts = torch.from_numpy(q[b]), torch.from_numpy(s[b])
        tx = torch.from_numpy(x[b])
        tidx = torch.from_numpy(idx[b]).long()
        raw, _, _ = torch_kpconv(tq, ts, tx, tidx, tkp, tw_off,
                                 "linear", "sum")
        raw = raw + torch.from_numpy(off_bias)
        offsets = raw[:, : 3 * P].reshape(M, P, 3) * EXTENT
        modul = 2 * torch.sigmoid(raw[:, 3 * P:])
        want, min_d2, kpts = torch_kpconv(
            tq, ts, tx, tidx, tkp, tw, "linear", "sum",
            offsets=offsets, modulations=modul)
        np.testing.assert_allclose(got[b], want.numpy(),
                                   rtol=1e-4, atol=1e-4)
        # p2p_fitting_regularizer terms (kpconv.py:12-45)
        fit_terms.append((min_d2 / EXTENT ** 2).mean())
        locs = kpts / EXTENT
        pd = torch.sqrt(
            ((locs[:, :, None, :] - locs[:, None, :, :]) ** 2).sum(-1)
            + 1e-12)
        repl = 0.0
        for i in range(P):
            other = torch.clamp(
                pd[:, i] - 1.2, max=0.0) ** 2
            other = other.sum(1) - torch.clamp(
                pd[:, i, i] - 1.2, max=0.0) ** 2
            repl = repl + other.mean() / P
        rep_terms.append(repl)

    # our op sows per-batch-mean; the torch loop averaged per cloud
    fitting = float(torch.stack(fit_terms).mean())
    repulsive = float(torch.stack(
        [torch.as_tensor(r) for r in rep_terms]).mean())
    want_reg = 2 * fitting + repulsive
    np.testing.assert_allclose(reg_got, want_reg, rtol=1e-3)


def test_shadow_convention_equals_mask_convention():
    """A fully-padded tail (sentinel idx) contributes nothing — the
    reference's 1e6 shadow row and our mask produce identical sums."""
    q, s, x, idx, nmask, w, kp = _setup(3)
    op = KPConvOp(out_dim=C_OUT, radius=RADIUS, kp_extent=EXTENT,
                  num_kpoints=P)
    variables = {"params": {"weights": jnp.asarray(w)}}
    full = np.asarray(op.apply(
        variables, jnp.asarray(q), jnp.asarray(s), jnp.asarray(x),
        jnp.asarray(idx), jnp.asarray(nmask)))
    # replace padding with arbitrary valid indices but mask them off:
    # result must not change
    rng = np.random.default_rng(9)
    junk = rng.integers(0, N, idx.shape).astype(np.int32)
    idx2 = np.where(nmask, idx, junk)
    got = np.asarray(op.apply(
        variables, jnp.asarray(q), jnp.asarray(s), jnp.asarray(x),
        jnp.asarray(idx2), jnp.asarray(nmask)))
    np.testing.assert_allclose(got, full, rtol=1e-5, atol=1e-6)
