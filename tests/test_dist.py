"""Distribution layer: sharded count step on the virtual 8-device CPU mesh."""

import numpy as np

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    import jax

    fn, args = graft.entry()
    counts = np.asarray(jax.jit(fn)(*args))
    assert counts.ndim == 2 and counts.shape[1] == 2
    assert (counts >= 0).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    # graph axis collapses to 1 when the device count is odd
    graft.dryrun_multichip(1)
