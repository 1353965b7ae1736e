"""Driver entry points: single-chip jit + 8-virtual-device mesh dry run."""

import jax
import numpy as np


def test_entry_jits():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == args[0].shape[:1]
    assert out.dtype == bool


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


import pytest


@pytest.mark.slow
def test_dryrun_multichip_2():
    """Second device count for the mesh dry run — same code paths as the
    8-way run above with different shard shapes; slow-marked (the default
    suite keeps the 8-way run, which is the driver's actual gate)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
