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


def setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache for CLI runs.

    Full-width SD compiles take minutes over a remote-compile tunnel
    (~5 min for the monolithic 866M train step); the on-disk cache makes
    every later launch (and the ``--segmented_sd auto`` probe) hit in
    seconds.  ``PHENDIFF_COMPILE_CACHE`` overrides the location; set it
    empty to disable.
    """
    cache = os.environ.get("PHENDIFF_COMPILE_CACHE", "/tmp/phendiff_jax_cache")
    if not cache:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
