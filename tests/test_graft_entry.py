"""Driver entry points: single-chip compile check + 8-device dry run on the
virtual CPU mesh."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import dryrun_multichip, entry  # noqa: E402
import pytest  # noqa: E402

pytestmark = pytest.mark.slow  # the driver exercises these separately every round


def test_entry_compiles_and_runs():
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 4
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    dryrun_multichip(8)
