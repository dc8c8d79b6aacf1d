"""KPConv training-pipeline integration: calibration, overflow
detection, potential-sampled + augmented epoch batches.

Reference semantics: prepare_batch_indices potentials
(data_utils/kpconv_loader.py:709-794), augmentation_transform
(kpconv_loader.py:415-491), and the calibration the reference freezes
as constants (kpconv_loader.py:696-706) here computed from data.
"""

import numpy as np
import pytest

from pointcloudlib_tpu.data import (
    PotentialSampler,
    kpconv_cls_batches,
)
from pointcloudlib_tpu.data.synthetic import SyntheticModelNet
from pointcloudlib_tpu.models.kpconv.calibrate import calibrate_pyramid
from pointcloudlib_tpu.models.kpconv.model import KPConvConfig
from pointcloudlib_tpu.models.kpconv.pyramid import (
    build_pyramid,
    grid_subsample,
    neighbor_counts,
    occupancy,
)


def _clouds(s=8, n=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((s, n, 3)).astype(np.float32)
    return pts / np.linalg.norm(pts, axis=-1, keepdims=True)  # unit sphere


def test_occupancy_detects_overflow():
    """grid_subsample truncates voxels beyond n_max silently; occupancy
    is the overflow detector the pyramid logs rely on."""
    xyz = _clouds(2, 512, seed=1)
    mask = np.ones((2, 512), bool)
    occ = np.asarray(occupancy(xyz, mask, dl=0.1))
    assert (occ > 4).all()
    # a cap below occupancy = overflow: subsample keeps exactly n_max
    cap = int(occ.min()) - 2
    _, vmask = grid_subsample(xyz, mask, 0.1, cap)
    assert np.asarray(vmask).sum(1).max() == cap       # truncated
    assert (occ > cap).any()                            # ...and detected
    # a cap above occupancy: every voxel kept, no overflow
    cap2 = int(occ.max()) + 8
    _, vmask2 = grid_subsample(xyz, mask, 0.1, cap2)
    np.testing.assert_array_equal(np.asarray(vmask2).sum(1), occ)


def test_neighbor_counts_uncapped():
    q = np.zeros((1, 1, 3), np.float32)
    s = np.zeros((1, 8, 3), np.float32)
    s[0, :, 0] = np.linspace(0, 1.0, 8)  # distances 0 … 1
    counts = np.asarray(neighbor_counts(
        q, np.ones((1, 1), bool), s, np.ones((1, 8), bool), radius=0.5
    ))
    assert counts[0, 0] == int((np.linspace(0, 1.0, 8) < 0.5).sum())


def test_calibration_prevents_truncation():
    cfg = KPConvConfig()
    clouds = _clouds(6, 512, seed=2)
    calib = calibrate_pyramid(
        clouds, 0.08, cfg.conv_radius, cfg.deform_radius, cfg.architecture,
    )
    assert len(calib.caps) == len(calib.neighborhood_limits) == 5
    # caps exceed observed occupancy (margin)
    assert all(c >= o for c, o in zip(calib.caps, calib.max_occupancy))
    # limits at the 90% quantile stay below the mean + tail
    assert all(l >= 1 for l in calib.neighborhood_limits)

    # building the pyramid with calibrated caps on the SAME clouds never
    # truncates: layer-0 valid count equals the true voxel occupancy
    mask = np.ones(clouds.shape[:2], bool)
    pyr = build_pyramid(
        clouds, mask, 0.08, cfg.conv_radius, cfg.deform_radius,
        cfg.architecture, calib.neighborhood_limits, caps=calib.caps,
    )
    occ0 = np.asarray(occupancy(clouds, mask, dl=0.08))
    np.testing.assert_array_equal(
        np.asarray(pyr.masks[0]).sum(1), occ0
    )


def test_potential_sampler_balances_coverage():
    """Items picked this epoch get bumped so later epochs visit the
    rest — over ceil(M/n) epochs every item is visited."""
    sampler = PotentialSampler(100, seed=0)
    seen = set()
    for _ in range(4):
        seen.update(sampler.sample(25).tolist())
    assert seen == set(range(100))


def test_kpconv_cls_batches_augments_and_contracts():
    ds = SyntheticModelNet(n_points=128, train=True, size=40, seed=0,
                           augment=False)
    sampler = PotentialSampler(len(ds), seed=0)
    rng = np.random.default_rng(0)
    batches = list(kpconv_cls_batches(ds, 8, sampler, rng, epoch_n=24))
    assert len(batches) == 3
    for b in batches:
        assert b["xyz"].shape == (8, 128, 3)
        assert b["valid"].all()
    # augmentation actually moved the points: same epoch drawn with and
    # without augment differs in xyz but not in labels
    s2, s3 = PotentialSampler(len(ds), 0), PotentialSampler(len(ds), 0)
    b2 = next(kpconv_cls_batches(ds, 8, s2, np.random.default_rng(0),
                                 epoch_n=24, augment=False))
    b3 = next(kpconv_cls_batches(ds, 8, s3, np.random.default_rng(0),
                                 epoch_n=24))
    assert not np.allclose(b2["xyz"], b3["xyz"])
    np.testing.assert_array_equal(b2["label"], b3["label"])


def test_kpconv_augment_semantics():
    from pointcloudlib_tpu.data import kpconv_augment

    pts = _clouds(1, 64, seed=3)[0]
    rng = np.random.default_rng(0)
    out = kpconv_augment(pts, rng, rotation="vertical")
    assert out.shape == pts.shape
    # vertical rotation + symmetric flips preserve |z| up to scale+noise
    z_ratio = np.abs(out[:, 2]) / np.maximum(np.abs(pts[:, 2]), 1e-6)
    med = np.median(z_ratio)
    assert 0.7 < med < 1.3  # scale range 0.8–1.2 (+noise)


def test_bucketed_calibration_and_batches():
    """Occupancy-bucketed batch shapes (the static-shape equivalent of
    the reference's point-budget batching, kpconv_loader.py:704):
    calibrate_buckets splits by layer-0 occupancy, the iterator routes
    each augmented cloud to its bucket's batch, and the small bucket's
    caps are genuinely smaller (that is the padding win)."""
    import jax

    from pointcloudlib_tpu.models.kpconv.calibrate import (
        calibrate_buckets, occupancy_np,
    )

    cfg = KPConvConfig()
    # clouds with very different occupancy: tight blobs vs full spheres
    rng = np.random.default_rng(5)
    small = rng.standard_normal((8, 256, 3)).astype(np.float32) * 0.1
    big = rng.standard_normal((8, 256, 3)).astype(np.float32)
    big /= np.linalg.norm(big, axis=-1, keepdims=True)
    clouds = np.concatenate([small, big])
    bcal = calibrate_buckets(clouds, 0.1, cfg.conv_radius,
                             cfg.deform_radius, cfg.architecture,
                             n_buckets=2)
    assert len(bcal.buckets) == 2 and len(bcal.bounds) == 1
    # the small bucket needs fewer voxels at layer 0
    assert bcal.buckets[0].caps[0] < bcal.buckets[1].caps[0]
    # assignment agrees with the device-side occupancy convention
    for c in clouds:
        o_host = occupancy_np(c, 0.1)
        o_dev = int(occupancy(
            np.asarray(c)[None], np.ones((1, len(c)), bool), dl=0.1)[0])
        assert o_host == o_dev, (o_host, o_dev)
    assert bcal.bucket_of(small[0]) == 0
    assert bcal.bucket_of(big[0]) == 1

    # the iterator emits uniform-bucket batches tagged with the bucket
    class _DS:
        def __len__(self):
            return len(clouds)

        def __getitem__(self, i):
            return clouds[i], None, i % 4

    sampler = PotentialSampler(len(clouds), seed=0)
    batches = list(kpconv_cls_batches(
        _DS(), 4, sampler, np.random.default_rng(0), epoch_n=16,
        augment=False, bucket_of=bcal.bucket_of))
    assert batches, "no batches emitted"
    seen = set()
    for b in batches:
        assert "bucket" in b
        seen.add(b["bucket"])
        for cloud in b["xyz"]:
            assert bcal.bucket_of(cloud) == b["bucket"]
    assert seen == {0, 1}


def test_merged_calibration_covers_every_bucket():
    """The init/eval model runs merged() shapes: element-wise max of
    caps AND neighborhood_limits across buckets. buckets[-1] alone is
    not safe — low-occupancy clouds are denser, so their in-radius
    quantiles can exceed the top bucket's limits."""
    from pointcloudlib_tpu.models.kpconv.calibrate import calibrate_buckets

    cfg = KPConvConfig()
    rng = np.random.default_rng(11)
    small = rng.standard_normal((8, 256, 3)).astype(np.float32) * 0.1
    big = rng.standard_normal((8, 256, 3)).astype(np.float32)
    big /= np.linalg.norm(big, axis=-1, keepdims=True)
    bcal = calibrate_buckets(
        np.concatenate([small, big]), 0.1, cfg.conv_radius,
        cfg.deform_radius, cfg.architecture, n_buckets=2)
    merged = bcal.merged()
    for b in bcal.buckets:
        for l in range(len(merged.caps)):
            assert merged.caps[l] >= b.caps[l]
            assert (merged.neighborhood_limits[l]
                    >= b.neighborhood_limits[l])
    # the dense (low-occupancy) bucket really does need wider neighbor
    # lists somewhere — the scenario that made buckets[-1] unsafe
    assert any(
        bcal.buckets[0].neighborhood_limits[l]
        > bcal.buckets[1].neighborhood_limits[l]
        for l in range(len(merged.caps))
    ), (bcal.buckets[0].neighborhood_limits,
        bcal.buckets[1].neighborhood_limits)


def test_bucketed_tail_batches_refund_potentials():
    """drop_last bucketed batching defers partial tail batches; the
    dropped clouds' potential bumps are refunded so they lead the next
    epoch's sample instead of silently losing their slot."""
    clouds = np.random.default_rng(3).standard_normal(
        (20, 64, 3)).astype(np.float32)

    class _DS:
        def __len__(self):
            return len(clouds)

        def __getitem__(self, i):
            return clouds[i], None, 0

    # odd bucket split: every cloud to bucket i%2 by id is impossible
    # (bucket_of sees the cloud), so split on a coordinate hash
    def bucket_of(p):
        return int(np.abs(p).sum() * 1e4) % 2

    sampler = PotentialSampler(len(clouds), seed=0)
    before = sampler.potentials.copy()
    batches = list(kpconv_cls_batches(
        _DS(), 8, sampler, np.random.default_rng(0), epoch_n=20,
        augment=False, bucket_of=bucket_of))
    n_trained = sum(int(b["valid"].sum()) for b in batches)
    # every non-trained sampled cloud got its bump back
    bumped = np.flatnonzero(sampler.potentials > before + 1e-12)
    assert len(bumped) == n_trained, (len(bumped), n_trained)
