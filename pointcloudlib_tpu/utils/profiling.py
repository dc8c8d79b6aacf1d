"""Profiling and step-timing utilities.

The reference has only ad-hoc wall-clock brackets around
``jt.sync_all(True)`` (misc/ops.py:761-777) and commented-out
``jt.profile_scope`` remnants (SURVEY.md §5.1). Here: a real
``jax.profiler`` trace context plus an EMA step timer, both flag-gated.

Platform note: on the tunneled axon platform only a value transfer
(``jax.device_get``) reliably fences device work — ``block_until_ready``
can return at enqueue time — so the timer syncs on the metrics pytree.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """``with trace("/tmp/jax-trace"):`` — profiler trace when a logdir
    is given, no-op otherwise."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timing (the KPConv voting loop keeps an EMA the same way,
    reference train_cls.py:288-299)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on: Any = None) -> float:
        if sync_on is not None:
            jax.device_get(sync_on)  # reliable fence (see module note)
        dt = (time.perf_counter() - self._t0) * 1e3
        self.ema_ms = (
            dt if self.ema_ms is None
            else (1 - self.alpha) * self.ema_ms + self.alpha * dt
        )
        return dt
