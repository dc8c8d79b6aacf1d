"""On-device KPConv pyramid vs the native host pipeline (cross-impl
oracle: the two builders must agree on the same inputs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloudlib_tpu.data.kpconv_pipeline import build_pyramid_host
from pointcloudlib_tpu.models.kpconv import build_pyramid
from pointcloudlib_tpu.models.kpconv.pyramid import pyramid_shapes

ARCH = ("simple", "resnetb", "resnetb_strided", "resnetb", "global_average")
LIMITS = (22, 35, 41, 42, 37)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    xyz = (rng.standard_normal((2, 128, 3)) * 0.4).astype(np.float32)
    mask = np.ones((2, 128), bool)
    return xyz, mask


def _neighbor_sets(idx, mask_sentinel):
    """Set of valid neighbor indices per query row."""
    return [
        set(int(x) for x in row if x != mask_sentinel) for row in idx
    ]


def test_host_and_device_pyramids_agree(cloud):
    xyz, mask = cloud
    caps = [128, 128]  # generous: cap-overflow drop order is impl-defined
    dev = build_pyramid(
        jnp.asarray(xyz), jnp.asarray(mask), 0.1, 2.5, 6.0, ARCH, LIMITS,
        caps=caps,
    )
    host = build_pyramid_host(xyz, mask, 0.1, 2.5, ARCH, LIMITS, caps=caps)

    assert len(dev.points) == len(host["points"]) == 2
    for l in range(2):
        dm = np.asarray(dev.masks[l])
        hm = host["masks"][l]
        # same voxel count per cloud
        np.testing.assert_array_equal(dm.sum(1), hm.sum(1))
        # same set of barycenters (order differs: device sorts by voxel
        # key, host by first occurrence)
        for b in range(2):
            d_pts = np.asarray(dev.points[l][b])[dm[b]]
            h_pts = host["points"][l][b][hm[b]]
            d_sorted = d_pts[np.lexsort(d_pts.T)]
            h_sorted = h_pts[np.lexsort(h_pts.T)]
            np.testing.assert_allclose(d_sorted, h_sorted, atol=1e-5)

    # neighbor structure: compare neighbor-count multisets per layer
    # (index spaces differ because point order differs)
    for l in range(2):
        n_dev = np.asarray(dev.neighbor_masks[l]).sum(-1)
        dm = np.asarray(dev.masks[l])
        nl = host["points"][l].shape[1]
        for b in range(2):
            h_counts = (host["neighbors"][l][b] != nl).sum(-1)[
                host["masks"][l][b]
            ]
            d_counts = n_dev[b][dm[b]]
            np.testing.assert_array_equal(
                np.sort(d_counts), np.sort(h_counts)
            )


MIXED_ARCH = ("simple", "resnetb", "resnetb_deformable_strided",
              "resnetb", "global_average")


def test_mixed_deform_layer_uses_split_radii(cloud):
    """Reference semantics (kpconv_loader.py:527-560): in a layer of
    rigid convs ending in a DEFORMABLE strided block, conv neighbors
    use the rigid radius but pool neighbors the deform radius. Device
    and host builders must agree under this split — and the pool lists
    must actually be wider than a rigid-pool build's."""
    from pointcloudlib_tpu.models.kpconv.pyramid import layer_deform_flags

    assert layer_deform_flags(
        ["resnetb", "resnetb_deformable_strided"]) == (False, True)
    assert layer_deform_flags(
        ["resnetb_deformable", "resnetb_strided"]) == (True, False)

    xyz, mask = cloud
    caps = [128, 128]
    dev = build_pyramid(
        jnp.asarray(xyz), jnp.asarray(mask), 0.1, 2.5, 6.0,
        MIXED_ARCH, LIMITS, caps=caps,
    )
    host = build_pyramid_host(
        xyz, mask, 0.1, 2.5, MIXED_ARCH, LIMITS, caps=caps,
        deform_radius=6.0,
    )
    # device/host agreement on layer-0 conv + pool count multisets
    nl = host["points"][0].shape[1]
    for b in range(2):
        d = np.asarray(dev.neighbor_masks[0]).sum(-1)[b][
            np.asarray(dev.masks[0][b])]
        h = (host["neighbors"][0][b] != nl).sum(-1)[host["masks"][0][b]]
        np.testing.assert_array_equal(np.sort(d), np.sort(h))
        dp = np.asarray(dev.pool_masks[0]).sum(-1)[b][
            np.asarray(dev.masks[1][b])]
        hp = (host["pools"][0][b] != nl).sum(-1)[host["masks"][1][b]]
        np.testing.assert_array_equal(np.sort(dp), np.sort(hp))

    # the deformable pool radius really is wider: rigid-everything
    # build of the same arch must have strictly fewer pool neighbors
    rigid = build_pyramid(
        jnp.asarray(xyz), jnp.asarray(mask), 0.1, 2.5, 2.5,
        MIXED_ARCH, LIMITS, caps=caps,
    )
    assert (int(np.asarray(dev.pool_masks[0]).sum())
            > int(np.asarray(rigid.pool_masks[0]).sum()))
    # while conv neighbors (rigid blocks) are identical either way
    np.testing.assert_array_equal(
        np.asarray(dev.neighbor_masks[0]), np.asarray(rigid.neighbor_masks[0]))
