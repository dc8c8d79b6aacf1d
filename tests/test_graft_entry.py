"""Driver-artifact sanity: entry() must trace, dryrun must run."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)  # trace only — no device compile
    assert out.shape == (8, 40)


def test_dryrun_multichip_runs():
    import __graft_entry__ as g

    # conftest pins an 8-device CPU platform, so this runs in-process
    g.dryrun_multichip(8)
