"""Coverage for the debug/profiling/logging utilities."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudlib_tpu.utils.debug import (
    assert_valid_indices,
    checked,
    debug_mode,
)
from pointcloudlib_tpu.utils.logging import MetricsLogger
from pointcloudlib_tpu.utils.profiling import StepTimer, trace


class TestDebug:
    def test_checked_catches_oob_gather(self):
        def f(x, i):
            return x[i]

        cf = checked(f)
        assert float(cf(jnp.arange(4.0), 2)) == 2.0
        with pytest.raises(Exception):
            cf(jnp.arange(4.0), 10)

    def test_assert_valid_indices_inside_checked(self):
        from jax.experimental import checkify

        def f(idx):
            assert_valid_indices(idx, 8)
            return idx.sum()

        cf = checkify.checkify(f)
        err, _ = cf(jnp.array([0, 8]))  # sentinel n allowed
        err.throw()  # no error
        err, _ = cf(jnp.array([0, 9]))
        with pytest.raises(Exception):
            err.throw()

    def test_debug_mode_restores_flag(self):
        before = jax.config.jax_debug_nans
        with debug_mode(True):
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == before


class TestProfiling:
    def test_step_timer_ema(self):
        t = StepTimer(alpha=0.5)
        t.start()
        time.sleep(0.01)
        dt = t.stop()
        assert dt >= 10.0
        assert t.ema_ms == pytest.approx(dt)

    def test_trace_noop_without_logdir(self):
        with trace(None):
            pass  # must not raise


class TestMetricsLogger:
    def test_writes_jsonl(self, tmp_path):
        log = MetricsLogger(str(tmp_path), run_name="t")
        log.log("epoch", epoch=1, loss=np.float32(2.5))
        log.close()
        rec = json.loads((tmp_path / "t.jsonl").read_text().strip())
        assert rec["event"] == "epoch"
        assert rec["loss"] == 2.5

    def test_disabled_without_dir(self):
        log = MetricsLogger(None)
        log.log("x", a=1)  # no-op, no crash
        log.close()
