"""Fused self-attention Pallas TPU kernel.

The UNet's spatial self-attention is the hottest non-conv op at high
resolution (SD latents at 512px → 4096 tokens).  The XLA path materializes
the [B, H, S, S] score tensor in HBM twice (scores + probs); this kernel
keeps everything for one (batch, head) in VMEM and writes only the [S, D]
output — one HBM read per operand, one write.

Design (v5e/v5p-friendly):

* Layout [BH, S, D]: grid over (bh, q-block); K/V for the (b,h) pair are
  brought fully into VMEM (S ≤ ~8k at D ≤ 128 fits the ~16 MB budget with
  double buffering), so the scores for a q-block are a single MXU matmul
  [BQ, D] @ [D, S] followed by an in-VMEM f32 softmax and a second matmul.
  No online-softmax bookkeeping is needed at these sequence lengths; this
  is deliberately NOT a FlashAttention port — it is sized to the diffusion
  UNet's working set.
* All accumulation in float32 (the reference sets upcast_attention=True
  for the SD-size config).
* Backward: custom VJP that recomputes probabilities with XLA einsums —
  attention here is a tiny fraction of backward FLOPs vs the convs, so we
  spend the memory savings where they matter (forward sampling loops).
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

# Interpreter mode lets the kernel run (slowly) on CPU for tests.
_INTERPRET = os.environ.get("PHENDIFF_PALLAS_INTERPRET", "0") == "1"


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q_ref: [1, BQ, D]; k_ref/v_ref: [1, S, D]; o_ref: [1, BQ, D]
    # Matmuls keep the input dtype (bf16 → full MXU rate) and accumulate in
    # f32; softmax math is f32.
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S] f32
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)  # [BQ, D]
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_fwd_3d(q3: Array, k3: Array, v3: Array, scale: float, block_q: int) -> Array:
    bh, s, d = q3.shape
    grid = (bh, s // block_q)
    return pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d,
            bytes_accessed=3 * bh * s * d * q3.dtype.itemsize
            + bh * s * d * q3.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
        interpret=_INTERPRET,
    )(q3, k3, v3)


def _pick_block_q(s: int) -> int:
    for bq in (512, 256, 128):
        if s % bq == 0:
            return bq
    return s  # small or odd sequence: single block


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    return _flash_fwd(q, k, v, scale)


def _flash_fwd_impl(q: Array, k: Array, v: Array, scale: float) -> Array:
    b, s, h, d = q.shape
    to3 = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    o3 = _flash_fwd_3d(to3(q), to3(k), to3(v), scale, _pick_block_q(s))
    return o3.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd_rule(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd_rule(scale, res, g):
    # Recompute-probabilities backward in XLA: matmuls in the input dtype
    # (bf16 → full MXU rate) with f32 accumulation; softmax math in f32.
    q, k, v = res
    qs = q * jnp.asarray(scale, q.dtype)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qs, k, preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    p_lo = p.astype(v.dtype)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p_lo, g,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v,
                    preferred_element_type=jnp.float32)
    # softmax backward: dS = P * (dP - sum_k(P * dP))
    ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qs,
                    preferred_element_type=jnp.float32)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None
) -> Array:
    """[B, S, H, D] fused attention.

    Arrays are handed to Mosaic compact (no head-dim padding): explicit
    zero-padding of D=8 heads to 128 lanes measured 1.3x SLOWER end to end
    on v5e (16x the HBM traffic for q/k/v; the MXU pads the contraction
    internally either way).  Set ``PHENDIFF_FLASH_PAD=1`` to restore
    padding for head dims Mosaic cannot tile (non-multiple-of-8).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    force_pad = os.environ.get("PHENDIFF_FLASH_PAD", "0") == "1"
    pad_d = (-d) % 128 if (force_pad or d % 8) else 0
    if pad_d:
        padding = [(0, 0)] * 3 + [(0, pad_d)]
        q, k, v = (jnp.pad(x, padding) for x in (q, k, v))
    out = _flash_attention(q, k, v, scale)
    if pad_d:
        out = out[..., :d]
    return out
