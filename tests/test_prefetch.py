"""Prefetch iterator tests."""

import time

import pytest

from pointcloudlib_tpu.data import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(20)), size=3)) == list(range(20))


def test_overlaps_producer_and_consumer():
    def slow_producer():
        for i in range(5):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_producer(), size=2):
        time.sleep(0.05)  # consumer work overlaps producer work
    overlapped = time.perf_counter() - t0
    # serial would be ~0.5s; overlap should be well under
    assert overlapped < 0.45, overlapped


def test_exception_propagates():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
