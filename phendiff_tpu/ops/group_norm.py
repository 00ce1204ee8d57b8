"""GroupNorm (+ fused activation) op.

The reference gets GroupNorm+SiLU from torch/cuDNN inside every diffusers
ResNet block.  Here it is a standalone functional op over NHWC maps:

* XLA path: reshape → f32 moments → normalize → affine → activation.  XLA
  fuses this into neighbouring elementwise work already.
* Pallas path (``phendiff_tpu/ops/gn_kernels.py``): a single-pass fused
  kernel used on TPU for large activations, avoiding two HBM round-trips
  for the moment computation.

Statistics are always computed in float32 (bf16 moments lose too much
precision for norm_eps=1e-5/1e-6).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def group_norm(
    x: Array,
    *,
    num_groups: int,
    eps: float,
    scale: Optional[Array] = None,
    bias: Optional[Array] = None,
    act: Optional[str] = None,
) -> Array:
    """GroupNorm over an NHWC tensor, optionally fused with an activation.

    Returns float32 (callers cast back to their compute dtype) so the
    affine+activation epilogue keeps full precision.
    """
    b, h, w, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    if act == "silu":
        xf = jax.nn.silu(xf)
    elif act is not None:
        raise ValueError(f"unknown activation: {act}")
    return xf
