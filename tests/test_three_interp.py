"""Fused three_interp kernel vs the XLA three_nn route (interpret
mode; compiled parity is part of the TPU verify recipe).

Covers the FP-decoder shapes (pn2 partseg fp1/fp2), the pointconv
decoder shapes whose support counts need 128-padding (N=36, 64), the
self-pair hard-copy contract (query ⊇ support ⇒ exact feature copy),
and the custom-VJP d_feats against the XLA route's autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu.ops.geometry import (
    _inverse_distance_weights,
    index_points,
    knn,
)
from pointcloudlib_tpu.ops.pallas.neighbors import three_interp


def _xla_three_interp(query, points, feats):
    _, idx = knn(query, points, 3)
    g = index_points(points, idx)
    d2 = jnp.sum((query[:, :, None, :] - g) ** 2, -1)
    w = _inverse_distance_weights(d2)
    return jnp.sum(index_points(feats, idx) * w[..., None], axis=2)


@pytest.mark.parametrize(
    "b,m,n,c",
    [(2, 64, 512, 128), (2, 32, 128, 256), (1, 40, 36, 64),
     (1, 24, 64, 16), (1, 16, 100, 3)],
)
def test_matches_xla(b, m, n, c):
    rng = np.random.default_rng(b * 1000 + n + c)
    q = jnp.asarray(rng.standard_normal((b, m, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    want = _xla_three_interp(q, p, f)
    got = three_interp(q, p, f, interpret=True)
    # selection + weights are exact (3-term coord split); the feature
    # gather's 2-term hi/lo split leaves ~2^-16 relative residual
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=5e-5)


def test_self_pair_hard_copy():
    """Interpolation queries include the coarse support points (FPS
    subsets): exact d2=0 must make the output a hard copy of the
    support feature (docs/DESIGN.md convergence defect)."""
    rng = np.random.default_rng(7)
    p = jnp.asarray(rng.standard_normal((1, 64, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((1, 64, 32)), jnp.float32)
    got = three_interp(p, p, f, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(f), rtol=1e-4, atol=1e-5)


def test_grad_feats_matches_xla():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 40, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((2, 56, 3)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((2, 56, 24)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((2, 40, 24)), jnp.float32)

    want = jax.grad(
        lambda ff: jnp.sum(_xla_three_interp(q, p, ff) * co))(f)
    got = jax.grad(
        lambda ff: jnp.sum(three_interp(q, p, ff, True) * co))(f)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
