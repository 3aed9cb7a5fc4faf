"""Driver-contract checks: entry() compiles; dryrun_multichip runs on a
virtual 8-device CPU mesh (the multi-chip validation mechanism, SURVEY.md §4)."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    val, grad = jax.jit(fn)(*args)
    jax.block_until_ready((val, grad))
    assert val.shape == ()
    assert grad.shape == args[0].shape
    assert not bool(jax.numpy.isnan(val))


def test_dryrun_multichip_8_devices():
    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    ge.dryrun_multichip(5)
