"""Driver-contract checks: entry() compiles; dryrun_multichip(8) runs."""

import sys
import os

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles():
    import __graft_entry__ as G
    fn, (state, data) = G.entry()
    out = jax.jit(fn)(state, data)
    jax.block_until_ready(out)
    assert out.theta.e.shape == state.theta.e.shape


def test_dryrun_multichip_8():
    import __graft_entry__ as G
    G.dryrun_multichip(8)
