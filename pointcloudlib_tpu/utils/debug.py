"""Debug-mode checks: NaN and out-of-bounds index detection.

The reference's only sanitizing is commented-out checkCudaErrors
(misc/ops.py:602-623; SURVEY.md §5.2). On TPU the equivalents are
``jax.checkify`` for in-graph assertions and ``jax.debug_nans``. The
CLIs' ``--debug`` flag calls :func:`enable` (process-wide NaN faulting)
and runs the first eval batch through :func:`checked` (OOB + NaN
checkify assertions).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable() -> None:
    """Process-wide debug switch (the CLIs' ``--debug``): NaNs fault at
    the op that produced them — jit'ed code is re-run op-by-op to
    localize the source."""
    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def debug_mode(enabled: bool = True) -> Iterator[None]:
    """Enable jax NaN debugging for the scope."""
    if not enabled:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checked(fn, *checks):
    """Wrap ``fn`` with checkify (index OOB + NaN checks by default).

    Returns a function with the same signature; raises on the first
    failed check when the result is materialized.
    """
    import functools
    import operator

    if not checks:
        err_sets = checkify.index_checks | checkify.nan_checks
    else:
        err_sets = functools.reduce(operator.or_, checks)
    cfn = checkify.checkify(fn, errors=err_sets)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_valid_indices(idx: jnp.ndarray, n: int, name: str = "idx"):
    """In-graph assertion that gather indices are within [0, n]
    (n allowed: the shadow sentinel)."""
    checkify.check(
        jnp.all((idx >= 0) & (idx <= n)),
        f"{name} out of range [0, {n}]",
    )
