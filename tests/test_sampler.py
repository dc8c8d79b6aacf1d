"""Potential sampler + KPConv augmentation tests."""

import numpy as np

from pointcloudlib_tpu.data.sampler import PotentialSampler, kpconv_augment


class TestPotentialSampler:
    def test_covers_all_items_over_epochs(self):
        s = PotentialSampler(100, seed=0)
        seen = set()
        for _ in range(4):
            seen.update(s.sample(25).tolist())
        assert seen == set(range(100)), "4 epochs of 25 must cover all 100"

    def test_balanced_long_run(self):
        s = PotentialSampler(50, seed=1)
        counts = np.zeros(50, int)
        for _ in range(20):
            counts[s.sample(10)] += 1
        assert counts.max() - counts.min() <= 1  # 200 picks over 50 items


class TestKPConvAugment:
    def test_shapes_and_scale_bounds(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((64, 3)).astype(np.float32)
        out = kpconv_augment(pts, rng, rotation="vertical")
        assert out.shape == pts.shape
        r_in = np.linalg.norm(pts, axis=1)
        r_out = np.linalg.norm(out, axis=1)
        assert (r_out < r_in * 1.25 + 0.05).all()
        assert (r_out > r_in * 0.75 - 0.05).all()

    def test_rotation_all_preserves_norms(self):
        rng = np.random.default_rng(2)
        pts = rng.standard_normal((32, 3)).astype(np.float32)
        out = kpconv_augment(
            pts, rng, rotation="all", scale_min=1.0, scale_max=1.0,
            symmetries=(False, False, False), noise=0.0,
        )
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), np.linalg.norm(pts, axis=1),
            rtol=1e-5,
        )
