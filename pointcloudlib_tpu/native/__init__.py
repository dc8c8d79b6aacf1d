"""Native host-preprocessing library (C++ core, ctypes bindings).

Framework-native replacement for the reference's cpp_wrappers
extensions (compile_wrappers.sh builds two CPython modules with
distutils; here one shared library with a C ABI serves grid subsampling,
radius neighbors, and FPS). Built on demand with g++ -O3 (build()); all
entry points have numpy fallbacks so the pure-Python path keeps working
where a toolchain is missing.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "src" / "preprocess.cpp"
_LIB = _DIR / "libpcl_tpu_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    global _build_failed
    if _LIB.exists() and not force:
        # stale-source guard: recompile when preprocess.cpp is newer
        # than the built library
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
    # build to a temp path and rename atomically: concurrent worker
    # processes may race this, and ctypes.CDLL of a half-written .so
    # segfaults
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(
        suffix=".so", dir=str(_LIB.parent))
    os.close(fd)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, str(_LIB))
        _build_failed = False
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        _build_failed = True
        return False
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB.exists() and not build():
            return None
        lib = ctypes.CDLL(str(_LIB))
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.pcl_grid_subsample.restype = ctypes.c_int32
        lib.pcl_grid_subsample.argtypes = [
            f32p, ctypes.c_int32, f32p, ctypes.c_int32, i32p,
            ctypes.c_int32, ctypes.c_float, f32p, f32p, i32p,
            ctypes.c_int32,
        ]
        lib.pcl_radius_neighbors.restype = ctypes.c_int32
        lib.pcl_radius_neighbors.argtypes = [
            f32p, ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_float,
            ctypes.c_int32, i32p,
        ]
        lib.pcl_fps.restype = None
        lib.pcl_fps.argtypes = [
            f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def grid_subsample(
    points: np.ndarray,
    dl: float,
    features: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    n_label_classes: int = 0,
    max_out: Optional[int] = None,
):
    """Voxel-grid subsample one cloud → (centers, features?, labels?).

    Semantics of the reference grid_subsampling
    (grid_subsampling.cpp:5-107): barycenter of points/features per
    occupied voxel, majority-vote labels.
    """
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    cap = max_out if max_out is not None else n
    if labels is not None and n_label_classes <= 0:
        # the C++ voter allocates n_label_classes slots per voxel; 0
        # would silently discard every vote and return all-zero labels
        n_label_classes = int(np.max(labels)) + 1 if len(labels) else 1
    lib = _load()
    if lib is None:
        return _grid_subsample_np(points, dl, features, labels, cap,
                                  n_label_classes)
    fdim = features.shape[1] if features is not None else 0
    feats = (
        np.ascontiguousarray(features, np.float32)
        if features is not None
        else None
    )
    labs = (
        np.ascontiguousarray(labels, np.int32) if labels is not None else None
    )
    out_p = np.empty((cap, 3), np.float32)
    out_f = np.empty((cap, fdim), np.float32) if feats is not None else None
    out_l = np.empty((cap,), np.int32) if labs is not None else None
    n_out = lib.pcl_grid_subsample(
        _f32p(points), n,
        _f32p(feats) if feats is not None else None, fdim,
        _i32p(labs) if labs is not None else None,
        n_label_classes if labs is not None else 0,
        ctypes.c_float(dl),
        _f32p(out_p),
        _f32p(out_f) if out_f is not None else None,
        _i32p(out_l) if out_l is not None else None,
        cap,
    )
    res = [out_p[:n_out]]
    if out_f is not None:
        res.append(out_f[:n_out])
    if out_l is not None:
        res.append(out_l[:n_out])
    return tuple(res) if len(res) > 1 else res[0]


def radius_neighbors(
    queries: np.ndarray, supports: np.ndarray, radius: float, k: int
) -> np.ndarray:
    """k nearest in-radius supports per query, ``[m, k] int32`` padded
    with the shadow sentinel ``len(supports)``."""
    queries = np.ascontiguousarray(queries, np.float32)
    supports = np.ascontiguousarray(supports, np.float32)
    lib = _load()
    if lib is None:
        return _radius_neighbors_np(queries, supports, radius, k)
    out = np.empty((len(queries), k), np.int32)
    lib.pcl_radius_neighbors(
        _f32p(queries), len(queries), _f32p(supports), len(supports),
        ctypes.c_float(radius), k, _i32p(out),
    )
    return out


def fps(points: np.ndarray, m: int, skip_near_origin: bool = True) -> np.ndarray:
    points = np.ascontiguousarray(points, np.float32)
    if m <= 0:
        return np.empty((0,), np.int32)
    lib = _load()
    if lib is None:
        return _fps_np(points, m, skip_near_origin)
    out = np.empty((m,), np.int32)
    lib.pcl_fps(_f32p(points), len(points), m, int(skip_near_origin),
                _i32p(out))
    return out


# ----------------------------------------------------------------- fallbacks

def _grid_subsample_np(points, dl, features, labels, cap,
                       n_label_classes=0):
    v = np.floor(points / dl).astype(np.int64)
    key = (v[:, 0] << 42) + (v[:, 1] << 21) + v[:, 2]
    # FIRST-OCCURRENCE voxel order, like the C++ path: np.unique's
    # sorted order would make a cap-truncation keep only the lowest-
    # coordinate corner of the cloud (a spatially degenerate subset)
    uniq_sorted, first_pos, inv_sorted = np.unique(
        key, return_index=True, return_inverse=True)
    order = np.argsort(np.argsort(first_pos))  # sorted-id -> arrival-id
    inv = order[inv_sorted]
    n_vox = len(uniq_sorted)
    n_out = min(n_vox, cap)
    cnt = np.bincount(inv, minlength=n_vox).astype(np.float32)
    centers = np.zeros((n_vox, 3), np.float32)
    np.add.at(centers, inv, points)
    centers /= cnt[:, None]
    res = [centers[:n_out]]
    if features is not None:
        f = np.zeros((n_vox, features.shape[1]), np.float32)
        np.add.at(f, inv, features.astype(np.float32))
        res.append((f / cnt[:, None])[:n_out])
    if labels is not None:
        lab = np.zeros(n_vox, np.int32)
        for u in range(n_out):
            vox_labels = labels[inv == u]
            if n_label_classes > 0:
                # match the C++ voter: ignore out-of-range labels
                vox_labels = vox_labels[
                    (vox_labels >= 0) & (vox_labels < n_label_classes)]
            if len(vox_labels):
                vals, c = np.unique(vox_labels, return_counts=True)
                lab[u] = vals[np.argmax(c)]
        res.append(lab[:n_out])
    return tuple(res) if len(res) > 1 else res[0]


def _radius_neighbors_np(queries, supports, radius, k):
    d2 = ((queries[:, None] - supports[None]) ** 2).sum(-1)
    d2 = np.where(d2 < radius * radius, d2, np.inf)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    invalid = np.take_along_axis(d2, idx, 1) == np.inf
    idx = np.where(invalid, len(supports), idx).astype(np.int32)
    if idx.shape[1] < k:
        pad = np.full((len(queries), k - idx.shape[1]), len(supports),
                      np.int32)
        idx = np.concatenate([idx, pad], 1)
    return idx


def _fps_np(points, m, skip):
    n = len(points)
    mind = np.full(n, 1e10, np.float32)
    elig = (points**2).sum(-1) > 1e-3 if skip else np.ones(n, bool)
    out = np.zeros(m, np.int32)
    last = 0
    for j in range(1, m):
        d2 = ((points - points[last]) ** 2).sum(-1)
        mind = np.minimum(mind, d2)
        score = np.where(elig, mind, -1.0)
        last = int(score.argmax())
        out[j] = last
    return out
