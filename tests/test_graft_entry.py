"""Driver entry-point smoke tests (CPU): entry() jits; dryrun runs."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    state, info = jax.jit(fn)(*args)
    jax.block_until_ready(state.particles)
    assert np.isfinite(np.asarray(info.estimate.mean)).all()
    assert state.particles.shape[0] == 4096


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
