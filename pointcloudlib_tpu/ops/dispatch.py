"""Backend dispatch for ops with both an XLA and a Pallas implementation.

The Pallas kernels compile only for TPU; on CPU (tests, virtual meshes)
the XLA compositions run instead. Selection happens once at import —
one process, one backend — and can be forced with
``POINTCLOUDLIB_KERNELS=xla|pallas`` for A/B benchmarking.
"""

from __future__ import annotations

import os

import jax

from pointcloudlib_tpu.ops import geometry


def _use_pallas() -> bool:
    forced = os.environ.get("POINTCLOUDLIB_KERNELS")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend init failure → safe fallback
        return False


# USE_PALLAS is a LAZY module attribute (PEP 562 __getattr__ below):
# computing it at import time touches jax.default_backend(), which
# initializes the XLA backend and breaks jax.distributed.initialize on
# multi-host deployments (any `import pointcloudlib_tpu` before
# parallel.multihost.initialize_multihost would wedge the pod —
# caught by tests/test_multihost.py). First ATTRIBUTE ACCESS resolves
# and caches it instead; POINTCLOUDLIB_KERNELS still short-circuits
# without a backend probe.
_USE_PALLAS_CACHE = None


def _resolve_use_pallas() -> bool:
    # an explicit `dispatch.USE_PALLAS = …` (tests monkeypatch it)
    # shadows the lazy probe — PEP 562 __getattr__ only fires when
    # normal lookup misses, so honor the same precedence here
    override = globals().get("USE_PALLAS")
    if override is not None:
        return override
    global _USE_PALLAS_CACHE
    if _USE_PALLAS_CACHE is None:
        _USE_PALLAS_CACHE = _use_pallas()
    return _USE_PALLAS_CACHE


def __getattr__(name: str):
    if name == "USE_PALLAS":
        return _resolve_use_pallas()
    raise AttributeError(name)


def fps(xyz, n_samples: int, skip_near_origin: bool = True):
    """Farthest-point sampling indices [B, n_samples] — Pallas on TPU,
    lax.scan elsewhere. Both produce bit-identical indices
    (tests/test_pallas_fps.py)."""
    if _resolve_use_pallas():
        from pointcloudlib_tpu.ops.pallas.fps import fps_pallas

        return fps_pallas(
            jax.lax.stop_gradient(xyz),
            n_samples,
            skip_near_origin=skip_near_origin,
            # a forced USE_PALLAS override off-TPU (tests do this)
            # must take the interpret path like every other gate
            interpret=jax.default_backend() != "tpu",
        )
    return geometry.farthest_point_sample(
        xyz, n_samples, skip_near_origin=skip_near_origin
    )
