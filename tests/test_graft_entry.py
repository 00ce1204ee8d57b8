"""Driver-contract tests: __graft_entry__.entry / dryrun_multichip."""

import sys
import pathlib

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_entry_signature():
    """entry() contract is checked structurally here; actually initializing
    the 128px flagship on the 1-core CPU takes ~5 min, and the driver
    compile-checks entry() on the real chip anyway."""
    import inspect

    assert callable(ge.entry)
    assert list(inspect.signature(ge.dryrun_multichip).parameters) == ["n_devices"]
