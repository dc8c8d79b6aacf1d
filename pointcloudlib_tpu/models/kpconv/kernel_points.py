"""Kernel-point disposition generation.

The reference optimizes kernel point layouts by repulsive-potential
gradient descent and caches them as .ply files
(networks/cls/kernel_points.py:551-744). This is a fresh numpy
implementation of the same idea: K points in the unit ball, mutual
inverse-square repulsion plus a spring toward the origin, first point
pinned at the center; the result is normalized so the mean point radius
is ~0.66 (points spread through the ball, matching the reference's
normalization to 1.5/2.5 of the init radius) and cached as .npy.
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

_CACHE_DIR = Path(__file__).parent / "dispositions"


def _optimize_dispositions(
    k: int, dim: int = 3, n_iter: int = 3000, seed: int = 42
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # init: random in unit ball, first point at origin
    pts = rng.standard_normal((k, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= rng.uniform(0.3, 1.0, (k, 1)) ** (1.0 / dim)
    pts[0] = 0.0

    lr = 0.01
    for _ in range(n_iter):
        diff = pts[:, None, :] - pts[None, :, :]          # [K, K, dim]
        d = np.linalg.norm(diff, axis=-1) + 1e-9
        np.fill_diagonal(d, np.inf)
        # inverse-square repulsion + linear attraction to the center
        rep = np.sum(diff / (d**3)[..., None], axis=1)
        grad = rep - 2.0 * pts
        pts = pts + lr * grad
        pts[0] = 0.0
        # keep inside the unit ball
        r = np.linalg.norm(pts, axis=1, keepdims=True)
        pts = np.where(r > 1.0, pts / np.maximum(r, 1e-9), pts)

    # normalize spread: non-center points' mean radius → 0.66 (points
    # occupy the ball interior like the reference's 1.5/2.5 scaling)
    r = np.linalg.norm(pts[1:], axis=1).mean()
    pts = pts * (0.66 / max(r, 1e-9))
    pts[0] = 0.0
    return pts.astype(np.float32)


def kernel_dispositions(k: int, dim: int = 3) -> np.ndarray:
    """Unit-scale kernel point layout ``[k, dim]``, cached on disk."""
    _CACHE_DIR.mkdir(exist_ok=True)
    cache = _CACHE_DIR / f"k_{k:03d}_{dim}D.npy"
    if cache.exists():
        return np.load(cache)
    pts = _optimize_dispositions(k, dim)
    np.save(cache, pts)
    return pts


@functools.lru_cache(maxsize=64)
def load_kernels(
    radius: float,
    num_kpoints: int,
    dimension: int = 3,
    fixed: str = "center",
    seed: int = 0,
) -> np.ndarray:
    """Kernel points scaled to ``radius`` with a random rotation and
    small noise (reference kernel_points.py:746-782 applies rotation +
    0.01·radius noise + radius scale on load)."""
    pts = kernel_dispositions(num_kpoints, dimension).copy()
    rng = np.random.default_rng(seed)
    if dimension == 3:
        # random rotation (Gram-Schmidt on gaussian vectors)
        m = rng.standard_normal((3, 3))
        q, r = np.linalg.qr(m)
        q *= np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        pts = pts @ q.T
    noise = rng.standard_normal(pts.shape).astype(np.float32) * 0.01
    pts = pts + noise
    if fixed == "center":
        pts[0] = 0.0
    return (pts * radius).astype(np.float32)
