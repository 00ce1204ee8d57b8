"""Driver-contract tests: __graft_entry__.entry / dryrun_multichip."""

import sys
import pathlib

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_entry_traces():
    """entry() must produce a jittable fn (trace-only here; the driver
    compiles it on the real chip)."""
    fn, args = ge.entry()
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == args[0].shape
