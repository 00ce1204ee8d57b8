"""Typed RNG key streams.

The reference synchronizes randomness across DDP ranks by broadcasting a
host coin flip (``utils_training.py:258-275``) and uses a fixed eval seed
``5742877512`` (``utils_training.py:698``).  In JAX the same traced program
runs on every device, so we replace all of that with named, splittable key
streams derived from one root seed: identical keys on every host ⇒ identical
branch decisions, no collective needed.
"""

from __future__ import annotations

from typing import Dict

import jax

# Fixed evaluation seed, kept numerically identical to the reference's
# (utils_training.py:698) so eval sampling is reproducible across runs.
EVAL_SEED = 5742877512


class KeyStream:
    """A mutable stream of PRNG keys: ``stream.next()`` splits and returns.

    Host-side convenience only — inside jitted code, thread keys
    functionally.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def fold_in(self, data: int) -> jax.Array:
        return jax.random.fold_in(self._key, data)


def make_streams(seed: int, names=("params", "train", "eval", "data")) -> Dict[str, KeyStream]:
    root = jax.random.key(seed)
    keys = jax.random.split(root, len(names))
    return {n: KeyStream(k) for n, k in zip(names, keys)}
