"""Pallas TPU kernel: fused GroupNorm (+affine +SiLU) in one VMEM pass.

The XLA path computes GroupNorm as reduce(moments) → elementwise chain,
which reads the activation from HBM twice.  This kernel brings one batch
element's activation into VMEM once, computes the per-group moments in
f32, and writes the normalized+activated result — a single HBM round trip.

Shapes: x is handed over as [B, S, C] (S = H*W, flattened spatially); one
grid program per batch element.  Requires C % num_groups == 0 and the
[S, C] slab to fit VMEM (a 128px level-0 map at C=64 in bf16 is 2 MB; SD
latent maps are smaller).  Falls back to the XLA implementation otherwise
(see ``group_norm`` dispatch in ``group_norm.py``).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INTERPRET = os.environ.get("PHENDIFF_PALLAS_INTERPRET", "0") == "1"

# VMEM budget: Mosaic keeps the input block, an f32 working copy, several
# f32 elementwise temps and the output alive on the kernel stack — measured
# ~30 bytes/element at bf16 input on v5e.  The single-pass win therefore
# only applies to mid/deep UNet levels; larger slabs fall back to the XLA
# chain (which is itself a good 3-pass program: stats read + fused
# normalize/act/cast read-write).
_MAX_SLAB_ELEMS = 450_000


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
               eps: float, act: Optional[str]):
    """Group moments via a channel→group one-hot matmul.

    Mosaic cannot lay out an in-kernel reshape that splits the lane (C)
    dimension into (groups, C/groups), so the per-group reduction is
    expressed as [1, C] @ [C, G] matmuls instead — MXU-friendly and
    layout-trivial.  Broadcast back with the transpose.
    """
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    s, c = x.shape
    cg = c // num_groups
    # one-hot channel→group matrix, built from iota (no data reshape)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch // cg == grp).astype(jnp.float32)  # [C, G]

    col_sum = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    col_sqsum = jnp.sum(x * x, axis=0, keepdims=True)
    n = float(s * cg)
    g_mean = jnp.dot(col_sum, member, preferred_element_type=jnp.float32) / n
    g_sqmean = jnp.dot(col_sqsum, member, preferred_element_type=jnp.float32) / n
    g_var = g_sqmean - g_mean * g_mean
    # broadcast group stats back to channels: [1, G] @ [G, C]
    mean_c = jnp.dot(g_mean, member.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(
        jax.lax.rsqrt(g_var + eps), member.T, preferred_element_type=jnp.float32
    )
    xn = (x - mean_c) * inv_c
    xn = xn * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if act == "silu":
        xn = xn * jax.nn.sigmoid(xn)
    o_ref[0] = xn.astype(o_ref.dtype)


def _reference_gn(x, scale, bias, num_groups: int, eps: float,
                  act: Optional[str]):
    """Pure-XLA f32 reference of the kernel (drives the custom VJP)."""
    b, s, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, s, c)
    xn = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        xn = jax.nn.silu(xn)
    return xn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn_op(x, scale, bias, num_groups, eps, act, out_dtype):
    return _pallas_gn(x, scale, bias, num_groups, eps, act, out_dtype)


def _fused_gn_fwd(x, scale, bias, num_groups, eps, act, out_dtype):
    out = _pallas_gn(x, scale, bias, num_groups, eps, act, out_dtype)
    return out, (x, scale, bias)


def _fused_gn_bwd(num_groups, eps, act, out_dtype, res, g):
    # Backward recomputes through the XLA reference (fused by XLA; the
    # forward's VMEM win is where the bandwidth lives in sampling loops).
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, sc, bi: _reference_gn(xx, sc, bi, num_groups, eps, act),
        x, scale, bias,
    )
    dx, dscale, dbias = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dscale.astype(scale.dtype), dbias.astype(bias.dtype)


_fused_gn_op.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def fused_group_norm(
    x: Array,  # [B, S, C]
    scale: Array,  # [C]
    bias: Array,  # [C]
    *,
    num_groups: int,
    eps: float,
    act: Optional[str] = None,
    out_dtype=None,
) -> Array:
    return _fused_gn_op(
        x, scale, bias, num_groups, eps, act,
        jnp.dtype(out_dtype or jnp.float32),
    )


def _pallas_gn(x, scale, bias, num_groups, eps, act, out_dtype) -> Array:
    b, s, c = x.shape
    kernel = functools.partial(
        _gn_kernel, num_groups=num_groups, eps=eps, act=act
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, c), out_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * s * c,
            bytes_accessed=2 * b * s * c * x.dtype.itemsize,
            transcendentals=b * s * c if act else 0,
        ),
        interpret=_INTERPRET,
    )(x, scale.reshape(1, c), bias.reshape(1, c))


def fits_vmem(s: int, c: int, itemsize: int) -> bool:
    del itemsize  # footprint is dominated by the f32 temporaries
    return s * c <= _MAX_SLAB_ELEMS
