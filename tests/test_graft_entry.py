"""The driver-facing entry points must stay green on the CPU mesh."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    carry, outs = jax.jit(fn)(*args)
    outs.x.block_until_ready()
    assert outs.x.shape == (16, 8, 2)
    assert bool(jax.numpy.all(carry.feasible))


def test_dryrun_multichip_virtual():
    ge.dryrun_multichip(4)
