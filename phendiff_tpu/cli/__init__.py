"""Entry-point CLIs (reference layer L4, SURVEY.md §1)."""

import os


def force_platform_from_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative for the CLI process.

    On hosts whose ``sitecustomize`` registers and re-prioritizes an
    out-of-process PJRT plugin (the tunneled-TPU dev setup), the env var
    alone does not win — ``jax.config.update`` before backend init does
    (tests/conftest.py carries the same note).  A user running
    ``JAX_PLATFORMS=cpu python -m phendiff_tpu.cli.train_cli`` gets CPU,
    not a hung tunnel handshake.  No-op when the variable is unset.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
