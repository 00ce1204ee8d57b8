"""Fused self-attention Pallas TPU kernels (forward + backward).

The UNet's spatial self-attention is the hottest non-conv op at high
resolution, and the naive formulation materializes [B, H, S, S] score /
probability tensors in HBM — measured at ~10 GB of the training step's
13 GB peak for the 128px flagship at batch 32.  Both directions here keep
everything for one (batch·head) in VMEM:

* **forward** — grid (BH, S/BQ): KV resident in VMEM, one [BQ, D] @ [D, S]
  MXU matmul, f32 softmax, second matmul.  No online-softmax bookkeeping:
  the kernel is sized to the diffusion UNet's working set (S ≤ ~8k).
* **backward** — grid (BH, S/BQ), ONE kernel producing dq (blocked) and
  dk/dv (VMEM-resident accumulators revisited across the q-block loop,
  initialized at block 0): per q-block it recomputes the probability rows
  from q/k (no lse needed — full rows are present), forms
  ds = p ⊙ (dp − rowsum(p ⊙ dp)), and issues three MXU matmuls.  Nothing
  [S, S]-shaped ever touches HBM.

All matmuls run in the input dtype (bf16 → full MXU rate) with f32
accumulation; softmax/backward math is f32.  Head dims are handed to
Mosaic compact — zero-padding D=8 heads to the 128-lane width measured
1.3x slower end to end (16x HBM traffic for zero MXU benefit; the MXU pads
the contraction internally).  ``PHENDIFF_FLASH_PAD=1`` restores padding for
head dims Mosaic cannot tile (non-multiples of 8).
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

# Interpreter mode lets the kernels run (slowly) on CPU for tests.
_INTERPRET = os.environ.get("PHENDIFF_PALLAS_INTERPRET", "0") == "1"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q_ref: [1, BQ, D]; k_ref/v_ref: [1, S, D]; o_ref: [1, BQ, D]
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


def _flash_fwd_3d(q3, k3, v3, scale: float, block_q: int) -> Array:
    bh, s, d = q3.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q3.dtype),
        grid=(bh, s // block_q),
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
            bytes_accessed=4 * bh * s * d * q3.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
        interpret=_INTERPRET,
    )(q3, k3, v3)


# ---------------------------------------------------------------------------
# backward: dq blocked + dk/dv accumulated, one kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    # blocks: q/g/dq [1, BQ, D]; k/v and dk/dv [1, S, D]
    # dk/dv blocks are revisited across the q-block loop (index_map constant
    # in the inner grid axis) → they live in VMEM as f32 accumulators.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    qs = q_ref[0] * jnp.asarray(scale, q_ref.dtype)  # [BQ, D]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    scores = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32 [BQ, S]

    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [BQ, 1]
    ds = (p * (dp - delta)).astype(q_ref.dtype)  # [BQ, S] bf16

    # dq = (ds @ k) * scale
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    # dk += ds^T @ (q*scale)   ([S, BQ] @ [BQ, D])
    dk_ref[0] += jax.lax.dot_general(
        ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dv += p^T @ g
    dv_ref[0] += jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_bwd_3d(q3, k3, v3, g3, scale: float, block_q: int):
    bh, s, d = q3.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, s, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
        ),
        grid=(bh, s // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * s * s * d,
            bytes_accessed=8 * bh * s * d * q3.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
        interpret=_INTERPRET,
    )(q3, k3, v3, g3)
    return dq, dk.astype(k3.dtype), dv.astype(v3.dtype)


# ---------------------------------------------------------------------------
# custom VJP plumbing
# ---------------------------------------------------------------------------


def _pick_block_q(s: int) -> int:
    # keep the [BQ, S] f32 temporaries (scores/p/dp) around ≤ 2 MB each
    for bq in (512, 256, 128):
        if s % bq == 0 and bq * s * 4 <= 2 * 1024 * 1024:
            return bq
    for bq in (512, 256, 128):
        if s % bq == 0:
            return min(bq, max(128, (2 * 1024 * 1024) // (4 * s)))
    return s  # small or odd sequence: single block


def _to3(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from3(x3, b, h):
    bh, s, d = x3.shape
    return x3.reshape(b, h, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd_impl(q, k, v, scale):
    b, s, h, d = q.shape
    o3 = _flash_fwd_3d(_to3(q), _to3(k), _to3(v), scale, _pick_block_q(s))
    return _from3(o3, b, h)


def _flash_fwd_rule(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd_rule(scale, res, g):
    q, k, v = res
    b, s, h, d = q.shape
    dq3, dk3, dv3 = _flash_bwd_3d(
        _to3(q), _to3(k), _to3(v), _to3(g.astype(q.dtype)),
        scale, _pick_block_q(s),
    )
    return _from3(dq3, b, h), _from3(dk3, b, h), _from3(dv3, b, h)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None
) -> Array:
    """[B, S, H, D] fused attention (forward + fused-backward custom VJP)."""
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
