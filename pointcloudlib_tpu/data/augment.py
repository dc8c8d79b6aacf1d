"""Host-side numpy augmentations (cheap, run in the input pipeline).

Reproduces the reference's ModelNet40 recipe
(data_utils/modelnet40_loader.py:104-132): unit-sphere normalization,
train-time anisotropic scale in [2/3, 3/2] and translation in ±0.2,
per-item point shuffle; and ShapeNet's train-time permutation
(data_utils/shapenet_loader.py:94-99).
"""

from __future__ import annotations

import numpy as np


def normalize_unit_sphere(pts: np.ndarray) -> np.ndarray:
    """Center at the centroid, scale to the unit sphere
    (modelnet40_loader.py:121-125)."""
    pts = pts - pts.mean(axis=0, keepdims=True)
    scale = np.max(np.linalg.norm(pts, axis=1))
    return pts / np.maximum(scale, 1e-12)


def random_scale_translate(
    pts: np.ndarray,
    rng: np.random.Generator,
    scale_lo: float = 2.0 / 3.0,
    scale_hi: float = 3.0 / 2.0,
    translate: float = 0.2,
) -> np.ndarray:
    """Anisotropic per-axis scale + translate (modelnet40_loader.py:128-132)."""
    s = rng.uniform(scale_lo, scale_hi, size=(1, 3)).astype(pts.dtype)
    t = rng.uniform(-translate, translate, size=(1, 3)).astype(pts.dtype)
    return pts * s + t


def random_permutation(n: int, rng: np.random.Generator) -> np.ndarray:
    return rng.permutation(n)


def normalize_unit_sphere_batch(pts: np.ndarray) -> np.ndarray:
    """Batched :func:`normalize_unit_sphere` for ``[B, N, 3]`` (one
    numpy call per batch instead of B python-loop items — matters on
    few-core hosts where the feed thread must outrun the device)."""
    pts = pts - pts.mean(axis=1, keepdims=True)
    # einsum square-norm: no [B, N, 3] temporary like linalg.norm
    scale = np.sqrt(np.einsum("bnc,bnc->bn", pts, pts).max(axis=1))
    return pts / np.maximum(scale, 1e-12)[:, None, None]


def random_scale_translate_batch(
    pts: np.ndarray,
    rng: np.random.Generator,
    scale_lo: float = 2.0 / 3.0,
    scale_hi: float = 3.0 / 2.0,
    translate: float = 0.2,
) -> np.ndarray:
    """Batched :func:`random_scale_translate`: independent per-cloud
    anisotropic scale/translate draws for ``[B, N, 3]``."""
    b = pts.shape[0]
    s = rng.uniform(scale_lo, scale_hi, size=(b, 1, 3)).astype(pts.dtype)
    t = rng.uniform(-translate, translate, size=(b, 1, 3)).astype(pts.dtype)
    return pts * s + t


def subsample_rows_batch(
    n_total: int, n_points: int, b: int, rng: np.random.Generator
) -> np.ndarray:
    """``[B, n_points]`` independent uniform subsets of ``range(n_total)``
    without replacement — the batched equivalent of
    ``rng.permutation(n_total)[:n_points]`` per item (same subset
    distribution; the within-subset ORDER is argpartition-arbitrary
    instead of uniformly random, irrelevant for point sets)."""
    keys = rng.random((b, n_total), dtype=np.float32)  # f32: 2x faster
    return np.argpartition(keys, n_points, axis=1)[:, :n_points]


def rotate_z(pts: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random rotation about the gravity axis (KPConv 'vertical' mode,
    data_utils/kpconv_loader.py:415-440)."""
    theta = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=pts.dtype)
    return pts @ rot.T


def jitter(
    pts: np.ndarray, rng: np.random.Generator, sigma: float = 0.001
) -> np.ndarray:
    return pts + rng.normal(0, sigma, pts.shape).astype(pts.dtype)
