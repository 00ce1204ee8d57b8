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

import os
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# "auto" uses the fused Pallas kernel on TPU when the slab fits VMEM and a
# scale/bias epilogue is present; "xla" / "pallas" force a path.
_IMPL_ENV = "PHENDIFF_GN_IMPL"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def group_norm(
    x: Array,
    *,
    num_groups: int,
    eps: float,
    scale: Optional[Array] = None,
    bias: Optional[Array] = None,
    act: Optional[str] = None,
    out_dtype=None,
    packed: int = 1,
    slot_channels=None,
) -> Array:
    """GroupNorm over an NHWC tensor, optionally fused with an activation.

    All statistics/affine/activation math runs in float32; ``out_dtype``
    selects the storage dtype of the result (pass the model's compute dtype
    so the fused kernel writes bf16 directly — an f32 output plus a
    separate cast pass would double the HBM traffic).  Default: float32.

    ``packed > 1``: ``x`` is a lane-packed tensor (ops/lane_pack.py) whose
    minor dim holds ``packed`` pixels' true channels; ``slot_channels``
    maps each packed slot to its TRUE channel index (defaults to the
    single-source parity-major layout).  Statistics are computed per SLOT
    in the same fused spatial reduction as the unpacked path, then
    combined per true-channel group — identical math, no relayout, and
    groups may span concat-source boundaries.  ``scale``/``bias`` stay
    per-TRUE-channel.
    """
    b, h, w, cs = x.shape
    c = cs // packed
    if cs % packed or c % num_groups:
        raise ValueError(
            f"channels {cs} not divisible by packed={packed} x groups {num_groups}"
        )
    out_dtype = out_dtype or jnp.float32
    if packed > 1:
        import numpy as np

        if slot_channels is None:
            slot_channels = np.tile(np.arange(c), packed)  # parity-major
        slot_channels = np.asarray(slot_channels)
        grp = slot_channels // (c // num_groups)  # static: slot → group
        # slot↔group membership as a constant 0/1 matrix: matmuls instead
        # of segment_sum/gather (TPU scatters are slow in scan bodies)
        memb = jnp.asarray(
            (grp[:, None] == np.arange(num_groups)[None, :]), jnp.float32
        )
        xf = x.astype(jnp.float32)
        # per-slot sums fuse into the producer exactly like the unpacked
        # one-pass moments; the group combine below is O(b x slots)
        ssum = jnp.sum(xf, axis=(1, 2))  # [b, S]
        ssq = jnp.sum(jnp.square(xf), axis=(1, 2))  # [b, S]
        gsum = ssum @ memb
        gsq = ssq @ memb
        n = h * w * packed * (c // num_groups)
        mean = gsum / n
        var = jnp.maximum(gsq / n - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        mean_slot = (mean @ memb.T)[:, None, None, :]
        rstd_slot = (rstd @ memb.T)[:, None, None, :]
        xf = (xf - mean_slot) * rstd_slot
        if scale is not None:
            xf = xf * scale.astype(jnp.float32)[slot_channels]
        if bias is not None:
            xf = xf + bias.astype(jnp.float32)[slot_channels]
        if act == "silu":
            xf = jax.nn.silu(xf)
        elif act is not None:
            raise ValueError(f"unknown activation: {act}")
        return xf.astype(out_dtype)

    # Default is the XLA chain: measured on v5e, the fused Pallas kernel is
    # ~2.6% slower end to end (XLA's 3-pass fused program is already near
    # the bandwidth roofline, and the kernel's in-VMEM f32 temporaries gate
    # it out of the large level-0 slabs where fusion would matter).  The
    # kernel stays available via PHENDIFF_GN_IMPL=pallas.
    impl = os.environ.get(_IMPL_ENV, "xla")
    use_pallas = impl == "pallas"
    if use_pallas:
        from phendiff_tpu.ops.gn_kernels import fits_vmem, fused_group_norm

        if fits_vmem(h * w, c, x.dtype.itemsize):
            out = fused_group_norm(
                x.reshape(b, h * w, c), scale, bias,
                num_groups=num_groups, eps=eps, act=act,
                out_dtype=out_dtype,
            )
            return out.reshape(b, h, w, c)

    # One-pass moments (E[x²] − E[x]²): sum and sum-of-squares fuse into a
    # single multi-output reduction over the producer — the two-pass
    # E[(x−mean)²] form costs an extra full HBM read of the activation map
    # per GroupNorm (profiled at ~13.6 ms/forward total on the flagship).
    # f32 accumulation over unit-scale activations keeps the cancellation
    # error far below norm_eps.
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    meansq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
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
    return xf.astype(out_dtype)
