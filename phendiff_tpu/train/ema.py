"""Exponential moving average of a param pytree with warmup schedule.

Capability parity with the reference's per-component ``EMAModel``
(``train.py:224-241``; step at ``utils_training.py:552-556``; eval swap at
``:667-682``) — same decay warmup law as the diffusers implementation:

    decay(step) = clamp(1 - (1 + step/inv_gamma)^(-power), min_decay, max_decay)

but expressed as a pure pytree transform (no module mutation): ``update``
returns a new EMA tree, and the eval path simply *uses* the EMA tree as the
model params — which also fixes the reference's store/copy_to-without-
restore quirk (SURVEY.md §3.2) where training silently continued from
EMA weights after each eval.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    inv_gamma: float = 1.0  # reference default (args_parser ema_inv_gamma)
    power: float = 0.75  # reference default (args_parser ema_power)
    max_decay: float = 0.9999  # reference default (args_parser ema_max_decay)
    min_decay: float = 0.0


def ema_decay(config: EMAConfig, step) -> jax.Array:
    step = jnp.asarray(step, dtype=jnp.float32)
    value = 1.0 - (1.0 + step / config.inv_gamma) ** (-config.power)
    return jnp.clip(value, config.min_decay, config.max_decay)


def ema_update(config: EMAConfig, ema_params, new_params, step):
    """One EMA step: ema ← decay·ema + (1-decay)·params."""
    d = ema_decay(config, step)
    return jax.tree.map(
        lambda e, p: (d * e + (1.0 - d) * p).astype(e.dtype), ema_params, new_params
    )
