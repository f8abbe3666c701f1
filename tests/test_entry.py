"""Driver entry-point tests: entry() compiles single-device; dryrun_multichip
exercises the full sharded solve on an 8-device virtual mesh."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    cost, grad = out
    assert cost.shape == (256,)
    assert grad.shape == (256, 50, 3)


def test_dryrun_multichip(cpu_devices):
    assert len(cpu_devices) >= 8
    ge.dryrun_multichip(8)
