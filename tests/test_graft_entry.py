"""Driver entry points must always compile and run (CPU mesh)."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    idx, recon = jax.jit(fn)(*args)
    assert idx.shape == (256, 4, 4, 4)
    assert recon.shape == (256, 8, 8, 8, 1)
    assert np.isfinite(np.asarray(recon)).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
