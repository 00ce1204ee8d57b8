"""Logger setup (the reference's ``setup_logger`` + MultiProcessAdapter,
``utils_misc.py:286-300``): per-process prefixed logging with a main-process
filter — in JAX terms, ``jax.process_index()``."""

from __future__ import annotations

import logging
import sys


def setup_logger(
    name: str = "phendiff",
    level: int = logging.INFO,
    main_process_only: bool = False,
) -> logging.Logger:
    import jax

    proc = jax.process_index()
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                f"%(asctime)s [p{proc}] %(levelname)s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        logger.addHandler(handler)
    if main_process_only and proc != 0:
        logger.setLevel(logging.CRITICAL)
    return logger
