"""Hilbert canonicalization (ops/spatial.py) and the windowed fused-SA
path it enables (ops/pallas/fused_sa.py _k_f1w/_k_p2w/_k_evalw)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu.ops.spatial import canonicalize, hilbert_keys


class TestHilbertKeys:
    def test_bijective_and_adjacent_on_full_grid(self):
        """The defining Hilbert property: visiting cells in key order
        moves exactly one grid step at a time — checked exhaustively
        on the full 4x4x4 grid (bits=2)."""
        bits = 2
        side = 1 << bits
        g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                     axis=-1).reshape(1, -1, 3).astype(np.float32)
        # feed integer coordinates: quantization maps them to themselves
        keys = np.asarray(hilbert_keys(jnp.asarray(g), bits=bits))[0]
        assert sorted(keys.tolist()) == list(range(side ** 3))
        order = np.argsort(keys)
        path = g[0][order]
        steps = np.abs(np.diff(path, axis=0)).sum(axis=1)
        assert np.all(steps == 1), f"non-adjacent step(s): {steps.max()}"

    def test_mask_excludes_padding_from_box(self):
        """Far-coordinate padding inflates the quantization box and
        collapses real points into a few cells; with the validity mask
        the keys must match the unpadded cloud's keys exactly."""
        rng = np.random.default_rng(3)
        real = rng.standard_normal((1, 64, 3)).astype(np.float32)
        pad = np.full((1, 64, 3), 1e6, np.float32)
        x = jnp.asarray(np.concatenate([real, pad], axis=1))
        mask = jnp.asarray(
            np.concatenate([np.ones((1, 64)), np.zeros((1, 64))],
                           axis=1).astype(bool))
        masked = np.asarray(hilbert_keys(x, mask=mask))[0, :64]
        want = np.asarray(hilbert_keys(jnp.asarray(real)))[0]
        np.testing.assert_array_equal(masked, want)
        # without the mask the real points collapse to few distinct keys
        unmasked = np.asarray(hilbert_keys(x))[0, :64]
        assert len(np.unique(unmasked)) < len(np.unique(want))

    def test_locality_beats_random_order(self):
        """Spatial neighbors should be near in key order."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 512, 3)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        xs, order = canonicalize(jnp.asarray(x))
        xs = np.asarray(xs)[0]
        d = np.linalg.norm(xs[:, None] - xs[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = np.argmin(d, axis=1)
        gap = np.abs(nn - np.arange(512))
        # random order would give mean gap ~512/3 ≈ 170
        assert gap.mean() < 60, gap.mean()

    def test_canonicalize_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 128, 3)).astype(np.float32)
        f = rng.standard_normal((2, 128, 5)).astype(np.float32)
        lbl = rng.integers(0, 50, (2, 128)).astype(np.int32)
        xs, fs, ls, order = canonicalize(
            jnp.asarray(x), jnp.asarray(f), jnp.asarray(lbl))
        order = np.asarray(order)
        for b in range(2):
            assert np.allclose(np.asarray(xs)[b], x[b][order[b]])
            assert np.allclose(np.asarray(fs)[b], f[b][order[b]])
            assert np.array_equal(np.asarray(ls)[b], lbl[b][order[b]])
        # None passthrough
        xs2, none, order2 = canonicalize(jnp.asarray(x), None)
        assert none is None
        assert np.allclose(np.asarray(xs2), np.asarray(xs))

    def test_idempotent(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 256, 3)).astype(np.float32)
        xs, _ = canonicalize(jnp.asarray(x))
        xs2, order2 = canonicalize(xs)
        assert np.allclose(np.asarray(xs2), np.asarray(xs))
        assert np.array_equal(np.asarray(order2)[0], np.arange(256))


def _line_cloud(b, n, seed=0):
    """A cloud along a smooth curve: after canonicalization, spatial
    neighborhoods are index-clustered — exercises the window branch."""
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 1, (b, n)), axis=1)
    x = np.stack([t, np.sin(4 * t), np.cos(4 * t)], axis=-1)
    x += rng.normal(0, 0.01, x.shape)
    return jnp.asarray(x.astype(np.float32))


class TestWindowedFusedSA:
    def _setup(self, b=2, n=256, m=64, k=16, c=(16, 16, 32), seed=0):
        from pointcloudlib_tpu.ops.pallas.fused_sa import SAParams

        rng = np.random.default_rng(seed)
        xyz, _ = canonicalize(_line_cloud(b, n, seed))
        from pointcloudlib_tpu.ops.geometry import (
            ball_query, farthest_point_sample, index_points,
        )

        fidx = farthest_point_sample(xyz, m)
        new_xyz = index_points(xyz, fidx)
        nidx, _ = ball_query(new_xyz, xyz, 0.25, k)
        c1, c2, c3 = c
        w1 = jnp.asarray(rng.standard_normal((3, c1)) * 0.3, jnp.float32)
        q = jnp.dot(xyz.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        off = jnp.dot(new_xyz.astype(jnp.bfloat16),
                      w1.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        params = SAParams(
            w2=jnp.asarray(rng.standard_normal((c1, c2)) * 0.3,
                           jnp.float32),
            w3=jnp.asarray(rng.standard_normal((c2, c3)) * 0.3,
                           jnp.float32),
            g1=jnp.ones((c1,)), b1=jnp.zeros((c1,)),
            g2=jnp.ones((c2,)), b2=jnp.zeros((c2,)),
            g3=jnp.ones((c3,)), b3=jnp.zeros((c3,)),
        )
        return q, off, nidx, params

    def test_window_plan_hits(self, monkeypatch):
        """On a canonicalized smooth cloud most tiles must be narrow —
        otherwise the fast path never runs and this suite is vacuous."""
        from pointcloudlib_tpu.ops.pallas.fused_sa import (
            _row_perm, _take_rows, _window_plan, _window_width,
        )

        monkeypatch.setenv("POINTCLOUDLIB_SA_WINDOW", "1")
        q, off, nidx, params = self._setup()
        n = q.shape[1]
        w = _window_width(n)
        assert w == 128, w
        sigma, _ = _row_perm(nidx)
        nidx_s = _take_rows(nidx, sigma)
        _, nblocks = _window_plan(nidx_s, 8, w, n)
        frac = float(jnp.mean((nblocks > 1).astype(jnp.float32)))
        assert frac < 0.5, f"wide fraction {frac}"

    def test_train_window_equals_nowindow(self, monkeypatch):
        """The windowed path must be numerically equivalent to the
        full-width path (same math, different summation tiling)."""
        from pointcloudlib_tpu.ops.pallas import fused_sa as fs

        q, off, nidx, params = self._setup()

        def run():
            def loss(q, off, params):
                out, stats = fs.fused_sa_train(q, off, nidx, params,
                                               True, None, 1)
                return jnp.sum(out * out), (out, stats)

            (l, (out, stats)), grads = jax.value_and_grad(
                loss, argnums=(0, 1, 2), has_aux=True)(q, off, params)
            return l, out, stats, grads

        monkeypatch.setenv("POINTCLOUDLIB_SA_WINDOW", "0")
        l0, out0, stats0, g0 = jax.jit(run)()
        monkeypatch.setenv("POINTCLOUDLIB_SA_WINDOW", "1")
        l1, out1, stats1, g1 = jax.jit(run)()

        assert np.allclose(out0, out1, atol=1e-5), np.max(
            np.abs(np.asarray(out0) - np.asarray(out1)))
        for a, b in zip(jax.tree_util.tree_leaves((stats0, g0)),
                        jax.tree_util.tree_leaves((stats1, g1))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)

    def test_eval_window_equals_nowindow(self, monkeypatch):
        from pointcloudlib_tpu.ops.pallas import fused_sa as fs

        q, off, nidx, params = self._setup()
        stats = fs.SAStats(*[jnp.full((c,), v, jnp.float32)
                             for c, v in ((16, 0.1), (16, 1.0),
                                          (16, 0.0), (16, 1.2),
                                          (32, -0.1), (32, 0.9))])
        monkeypatch.setenv("POINTCLOUDLIB_SA_WINDOW", "0")
        out0 = fs.fused_sa_eval(q, off, nidx, params, stats,
                                interpret=jax.default_backend() != "tpu")
        jax.clear_caches()
        monkeypatch.setenv("POINTCLOUDLIB_SA_WINDOW", "1")
        out1 = fs.fused_sa_eval(q, off, nidx, params, stats,
                                interpret=jax.default_backend() != "tpu")
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                   rtol=1e-5, atol=1e-5)

    def test_scattered_indices_still_exact(self, monkeypatch):
        """Adversarial input (random order, windows overflow): the wide
        fallback must reproduce the unwindowed math."""
        from pointcloudlib_tpu.ops.pallas import fused_sa as fs

        rng = np.random.default_rng(3)
        b, n, m, k, c1 = 2, 256, 64, 16, 16
        q = jnp.asarray(rng.standard_normal((b, n, c1)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, m, c1)) * 0.1,
                          jnp.float32)
        nidx = jnp.asarray(rng.integers(0, n, (b, m, k)), jnp.int32)
        params = fs.SAParams(
            w2=jnp.asarray(rng.standard_normal((c1, 16)) * 0.3,
                           jnp.float32),
            w3=jnp.asarray(rng.standard_normal((16, 32)) * 0.3,
                           jnp.float32),
            g1=jnp.ones((16,)), b1=jnp.zeros((16,)),
            g2=jnp.ones((16,)), b2=jnp.zeros((16,)),
            g3=jnp.ones((32,)), b3=jnp.zeros((32,)),
        )

        def run():
            def loss(q, off, params):
                out, stats = fs.fused_sa_train(q, off, nidx, params,
                                               True, None, 1)
                return jnp.sum(out * out), out

            (l, out), grads = jax.value_and_grad(
                loss, argnums=(0, 1, 2), has_aux=True)(q, off, params)
            return l, out, grads

        monkeypatch.setenv("POINTCLOUDLIB_SA_WINDOW", "0")
        l0, out0, g0 = jax.jit(run)()
        monkeypatch.setenv("POINTCLOUDLIB_SA_WINDOW", "1")
        l1, out1, g1 = jax.jit(run)()
        assert np.allclose(out0, out1, atol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=1e-5)
