"""Mixed-precision policy for TPU: f32 params, bf16 compute.

Replaces the reference's AMP fp16 autocast + GradScaler
(``train.py:68-74``, ``args_parser.py:380-390``): on TPU, bfloat16 shares
float32's exponent range, so no loss scaling is needed — we keep master
params in float32, cast activations/weights to bfloat16 at the model
boundary, and accumulate matmuls in float32 (XLA default for bf16 MXU ops).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _dtype(name):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[
        name
    ]


@dataclasses.dataclass(frozen=True)
class Policy:
    """param_dtype: storage; compute_dtype: activations/matmuls; output_dtype."""

    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    output_dtype: str = "float32"

    @classmethod
    def from_mixed_precision(cls, mixed_precision: str) -> "Policy":
        """Map the reference's --mixed_precision {no,fp16,bf16} flag."""
        if mixed_precision in (None, "no", "fp32", "float32"):
            return cls()
        if mixed_precision in ("bf16", "bfloat16", "fp16", "float16"):
            # fp16 is deliberately mapped to bf16: fp16 has no advantage on
            # TPU and would need loss scaling.
            return cls(compute_dtype="bfloat16", output_dtype="float32")
        raise ValueError(f"unknown mixed_precision: {mixed_precision}")

    @property
    def param_jnp(self):
        return _dtype(self.param_dtype)

    @property
    def compute_jnp(self):
        return _dtype(self.compute_dtype)

    @property
    def output_jnp(self):
        return _dtype(self.output_dtype)

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_jnp)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )
