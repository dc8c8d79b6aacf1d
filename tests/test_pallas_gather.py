"""Pallas gather-as-matmul kernel vs XLA take_along_axis (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu.ops.pallas.gather import gather_neighbors


@pytest.mark.parametrize("b,n,c,m,k", [(2, 64, 8, 16, 4), (1, 128, 3, 32, 7)])
def test_matches_xla_gather(b, n, c, m, k):
    rng = np.random.default_rng(n + c)
    pts = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
    want = jnp.take_along_axis(
        pts, idx.reshape(b, -1, 1), axis=1
    ).reshape(b, m, k, c)
    got = gather_neighbors(pts, idx, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_shadow_sentinel_zero():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((2, 32, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 32, (2, 8, 3)), jnp.int32)
    idx = idx.at[:, :, 1].set(32)  # one-past-the-end sentinel
    got = np.asarray(gather_neighbors(pts, idx, interpret=True))
    np.testing.assert_array_equal(got[:, :, 1], 0.0)


def test_index_points_pads_non_lane_sources(monkeypatch):
    """index_points routes N % 128 != 0 sources to the Pallas gather —
    zero-padding rows up to the next lane tile — when the measured cost
    model says the one-hot matmul beats XLA's row gather (large total
    row count); small gathers stay on XLA. See docs/DESIGN.md "Generic
    gather routing" for the v5e measurements behind the model."""
    import pointcloudlib_tpu.ops.dispatch as dispatch
    import pointcloudlib_tpu.ops.pallas.gather as gather_mod
    from pointcloudlib_tpu.ops.geometry import index_points

    monkeypatch.setattr(dispatch, "USE_PALLAS", True)
    real = gather_mod.gather_neighbors
    seen = {}

    def fake(pts, idx, **kw):
        seen["n"] = pts.shape[1]
        return real(pts, idx, interpret=True)

    monkeypatch.setattr(gather_mod, "gather_neighbors", fake)
    rng = np.random.default_rng(2)
    # rows = 8*512*64 = 262k > the ~196k crossover at N_pad=256
    b, n, c, m, k = 8, 136, 5, 512, 64
    pts = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
    got = index_points(pts, idx)
    assert seen["n"] == 256, seen  # padded to a whole lane tile
    want = jnp.take_along_axis(
        pts, idx.reshape(b, -1, 1), axis=1).reshape(b, m, k, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # below the crossover the non-aligned source stays on XLA
    seen.clear()
    small = index_points(pts, idx[:, :8, :4])
    assert "n" not in seen
    np.testing.assert_allclose(
        np.asarray(small),
        np.asarray(jnp.take_along_axis(
            pts, idx[:, :8, :4].reshape(b, -1, 1), axis=1
        ).reshape(b, 8, 4, c)), rtol=1e-5, atol=1e-5)


def test_vjp_matches_xla():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((2, 48, 6)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 48, (2, 12, 5)), jnp.int32)

    def f_pallas(p):
        return jnp.sum(jnp.sin(gather_neighbors(p, idx, interpret=True)))

    def f_xla(p):
        g = jnp.take_along_axis(p, idx.reshape(2, -1, 1), axis=1)
        return jnp.sum(jnp.sin(g))

    g1 = jax.grad(f_pallas)(pts)
    g2 = jax.grad(f_xla)(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_vmem_plan_counts_full_footprint():
    """Round-4 regression: the scatter plan must budget the FULL kernel
    footprint (iota + one-hot + [n, c_pad] accumulator + double-buffered
    blocks), not just the one-hot. At PointCNN partseg's backward shape
    (m=2048, k=8, n=2048, c=131) round 3 picked mt=128 (17.28 MB — OOM
    on chip, BENCH_r03); the plan must now pick a tile that fits."""
    from pointcloudlib_tpu.ops.pallas.gather import (
        _VMEM_BUDGET, _footprint, _row_pad_plan,
    )

    mt, pad = _row_pad_plan(2048, 8, 2048, 131)
    assert mt and mt < 128 and pad == 0
    assert _footprint(mt, 8, 2048, 131) <= _VMEM_BUDGET
    # headline SA1-scale gather keeps its round-3 tile (perf-tuned)
    assert _row_pad_plan(512, 64, 1024, 6) == (16, 0)


def test_scatter_rows_xla_fallback_parity():
    """When even mt=8 cannot fit (huge n·c_pad), scatter_rows must take
    the XLA scatter-add and match the kernel's semantics, including
    dropping sentinel rows (idx >= n)."""
    from pointcloudlib_tpu.ops.pallas import gather as gm

    rng = np.random.default_rng(7)
    b, m, k, c, n = 2, 24, 4, 6, 64
    g = jnp.asarray(rng.standard_normal((b, m, k, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
    idx = idx.at[:, 3, 1].set(n)  # sentinel: must contribute nothing
    want = np.asarray(gm._gather_bwd_impl(g, idx, n, interpret=True))
    got = np.asarray(gm._scatter_xla(g, idx, n))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # and scatter_rows itself returns the XLA result when nothing fits
    assert gm._row_pad_plan(8, 4, 1 << 14, 1 << 12)[0] == 0


def test_gather_fwd_xla_fallback_contract(monkeypatch):
    """_gather_fwd_impl's no-fit fallback zero-fills sentinel rows."""
    from pointcloudlib_tpu.ops.pallas import gather as gm

    monkeypatch.setattr(gm, "_VMEM_BUDGET", 0)
    rng = np.random.default_rng(9)
    pts = jnp.asarray(rng.standard_normal((2, 32, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 32, (2, 8, 3)), jnp.int32)
    idx = idx.at[:, :, 1].set(32)
    got = np.asarray(gm._gather_fwd_impl(pts, idx))
    np.testing.assert_array_equal(got[:, :, 1], 0.0)
    want = np.asarray(jnp.take_along_axis(
        pts, idx.reshape(2, -1, 1), axis=1, mode="fill", fill_value=0.0,
    ).reshape(2, 8, 3, 4))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gather_odd_m_pads_rows():
    """m with no multiple-of-8 divisor (e.g. 37): _tile_m signals a
    row-pad instead of abandoning the VMEM budget with mt=m; sentinel
    padding rows gather/scatter exact zeros and are sliced away."""
    import jax

    from pointcloudlib_tpu.ops.pallas.gather import (
        _row_pad_plan, gather_neighbors,
    )

    mt, pad = _row_pad_plan(37, 5, 256, 8)
    assert pad > 0 and (37 + pad) % mt == 0 and mt % 8 == 0

    rng = np.random.default_rng(3)
    b, n, m, k, c = 2, 256, 37, 5, 8
    pts = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
    out = gather_neighbors(pts, idx, True)
    ref = jax.vmap(lambda p, i: p[i])(pts, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)
    g = jax.grad(lambda p: gather_neighbors(p, idx, True).sum())(pts)
    gr = jax.grad(
        lambda p: jax.vmap(lambda pp, ii: pp[ii])(p, idx).sum())(pts)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=3e-5)
