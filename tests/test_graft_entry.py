"""Driver-hook regression tests: __graft_entry__ must always compile."""

import sys

import jax
import pytest


@pytest.fixture(scope="module")
def graft():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g


def test_dryrun_multichip_8(graft):
    graft.dryrun_multichip(8)  # raises on failure


def test_entry_compiles(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    shapes = jax.tree.map(lambda x: x.shape, out)
    assert shapes == ((8, 512), (8, 512))
