"""Fused self-attention Pallas TPU kernels (forward + backward).

The UNet's spatial self-attention is the hottest non-conv op at high
resolution, and the naive formulation materializes [B, H, S, S] score /
probability tensors in HBM — measured at ~10 GB of the training step's
13 GB peak for the 128px flagship at batch 32.  Both directions here keep
everything for one (batch·head) in VMEM.

**Layout: [BH, D, S] ("DS"), sequence minor.**  The natural [BH, S, D]
layout puts the head dim minor; with D=8 heads, TPU's (sublane, 128-lane)
tiling pads the 8-wide minor dim to 128 lanes — a 16× HBM inflation that
round-1 profiling measured at ~9.4 ms/forward of pure layout copies plus
~1 ms/op of padded kernel HBM traffic on the flagship model.  Storing
q/k/v/o transposed per head ([D, S], S on lanes) makes every tensor
compact; the in-kernel matmuls contract sublanes instead:

* **forward** — grid (BH/HP, S/BQ), HP heads per program (independent
  per-head chains let Mosaic overlap one head's softmax VPU work with the
  next head's MXU matmuls): scores = qᵀk via a sublane-contraction
  dot_general, f32 softmax, then oᵀ = v pᵀ.  The softmax *denominator
  rides the PV matmul for free*: v carries an appended ones-row, so row D
  of the output is Σₖ p — one [D+1, BQ] divide replaces a full [BQ, S]
  normalization pass.
* **backward** — same grid, ONE kernel producing dq (blocked) and dk/dv
  (VMEM-resident f32 accumulators revisited across the q-block loop):
  per q-block it recomputes the probability rows from q/k, forms
  ds = p ⊙ (dp − rowsum(p ⊙ dp)), and issues four sublane-oriented MXU
  matmuls.  Nothing [S, S]-shaped ever touches HBM.

All matmuls run in the input dtype (bf16 → full MXU rate) with f32
accumulation; softmax/backward math is f32.  Head dims that are not a
multiple of 8 are zero-padded to the next multiple (cheap: D is
second-minor in this layout, so padding costs sublanes, not lanes).
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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, hp: int):
    # q_ref/o_ref: [HP, D, BQ]; k_ref: [HP, D, S]; v_ref: [HP, D+1, S]
    # (v's last row is ones: the PV matmul then also emits the softmax
    # denominator as its last output row.)
    for h in range(hp):
        q = q_ref[h] * jnp.asarray(scale, q_ref.dtype)  # [D, BQ]
        k = k_ref[h]  # [D, S]
        v = v_ref[h]  # [D+1, S]
        scores = jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, S] f32
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m).astype(v.dtype)  # unnormalized, bf16
        od = jax.lax.dot_general(
            v, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [D+1, BQ]; row D = Σₖ p  (denominator)
        o_ref[h] = (od[:-1] / od[-1:]).astype(o_ref.dtype)


def _flash_fwd_3d(q3, k3, v3p, scale: float, block_q: int, hp: int) -> Array:
    bh, d1, s = v3p.shape
    d = d1 - 1
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, hp=hp),
        out_shape=jax.ShapeDtypeStruct((bh, d, s), q3.dtype),
        grid=(bh // hp, s // block_q),
        in_specs=[
            pl.BlockSpec((hp, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d, s), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d1, s), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp, d, block_q), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d,
            bytes_accessed=4 * bh * s * d * q3.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
        interpret=_INTERPRET,
    )(q3, k3, v3p)


# ---------------------------------------------------------------------------
# backward: dq blocked + dk/dv accumulated, one kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, hp: int):
    # blocks: q/g/dq [HP, D, BQ]; k/v and dk/dv [HP, D, S]
    # dk/dv blocks are revisited across the q-block loop (index_map constant
    # in the inner grid axis) → they live in VMEM as f32 accumulators.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    for h in range(hp):
        qs = q_ref[h] * jnp.asarray(scale, q_ref.dtype)  # [D, BQ]
        k = k_ref[h]  # [D, S]
        v = v_ref[h]  # [D, S]
        g = g_ref[h]  # [D, BQ]

        scores = jax.lax.dot_general(
            qs, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, S]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32 [BQ, S]

        dp = jax.lax.dot_general(
            g, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, S]
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # [BQ, 1]
        ds = (p * (dp - delta)).astype(q_ref.dtype)  # [BQ, S] bf16

        # dqᵀ = (k @ dsᵀ) * scale : contract S → [D, BQ]
        dq = jax.lax.dot_general(
            k, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dq_ref[h] = dq.astype(dq_ref.dtype)
        # dkᵀ += (q*scale) @ ds : contract BQ → [D, S]
        dk_ref[h] += jax.lax.dot_general(
            qs, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dvᵀ += g @ p : contract BQ → [D, S]
        dv_ref[h] += jax.lax.dot_general(
            g, p.astype(g.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _flash_bwd_3d(q3, k3, v3, g3, scale: float, block_q: int, hp: int):
    bh, d, s = q3.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, hp=hp),
        out_shape=(
            jax.ShapeDtypeStruct((bh, d, s), q3.dtype),
            jax.ShapeDtypeStruct((bh, d, s), jnp.float32),
            jax.ShapeDtypeStruct((bh, d, s), jnp.float32),
        ),
        grid=(bh // hp, s // block_q),
        in_specs=[
            pl.BlockSpec((hp, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d, s), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d, s), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((hp, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d, s), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d, s), lambda b, i: (b, 0, 0),
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

# Per-program f32 [BQ, S] temporaries (scores / p / dp); keep each ≤ ~4 MB
# so HP heads' chains plus double-buffered inputs stay inside ~16 MB VMEM.
_SCORES_BYTES = 4 * 1024 * 1024


def _pick_block_q(s: int) -> int:
    for bq in (1024, 512, 256, 128):
        if s % bq == 0 and bq * s * 4 <= _SCORES_BYTES:
            return bq
    # very long sequences: no block meets the budget — clamp to the
    # smallest divisor so the f32 temporaries stay VMEM-sized
    for bq in (128, 256, 512):
        if s % bq == 0:
            return bq
    return s  # small or odd sequence: single block


def _pick_hp(bh: int, s: int, block_q: int) -> int:
    # More heads per program → more independent chains for the Mosaic
    # scheduler to overlap, bounded by the f32 temporaries' VMEM footprint.
    for hp in (4, 2):
        if bh % hp == 0 and hp * block_q * s * 4 <= 2 * _SCORES_BYTES:
            return hp
    return 1


def _to_ds(x):
    # [B, S, H, D] → [BH, D, S]  (compact: S rides the 128-lane minor dim)
    b, s, h, d = x.shape
    return x.transpose(0, 2, 3, 1).reshape(b * h, d, s)


def _from_ds(x3, b, h):
    bh, d, s = x3.shape
    return x3.reshape(b, h, d, s).transpose(0, 3, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd_impl(q, k, v, scale):
    b, s, h, d = q.shape
    v3 = _to_ds(v)
    ones = jnp.ones((v3.shape[0], 1, s), v3.dtype)
    bq = _pick_block_q(s)
    o3 = _flash_fwd_3d(
        _to_ds(q), _to_ds(k), jnp.concatenate([v3, ones], axis=1),
        scale, bq, _pick_hp(b * h, s, bq),
    )
    return _from_ds(o3, b, h)


def _flash_fwd_rule(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _pick_block_q_bwd(s: int) -> int:
    # The backward keeps ~3 live f32 [BQ, S] temporaries (p, dp, ds) plus
    # the dk/dv accumulators → smaller blocks than the forward.
    for bq in (512, 256, 128):
        if s % bq == 0 and bq * s * 4 <= _SCORES_BYTES // 2:
            return bq
    for bq in (128, 256, 512):  # over-budget: smallest divisor wins
        if s % bq == 0:
            return bq
    return s


def _flash_bwd_rule(scale, res, g):
    q, k, v = res
    b, s, h, d = q.shape
    bq = _pick_block_q_bwd(s)
    hp = 1
    for cand in (2,):
        if (b * h) % cand == 0 and cand * 3 * bq * s * 4 <= 3 * _SCORES_BYTES:
            hp = cand
    dq3, dk3, dv3 = _flash_bwd_3d(
        _to_ds(q), _to_ds(k), _to_ds(v), _to_ds(g.astype(q.dtype)),
        scale, bq, hp,
    )
    return _from_ds(dq3, b, h), _from_ds(dk3, b, h), _from_ds(dv3, b, h)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None
) -> Array:
    """[B, S, H, D] fused attention (forward + fused-backward custom VJP)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    # Head dims are zero-padded up to a multiple of 8 (a sublane tile);
    # pad rows add zero to every score and are sliced off the output.
    pad_d = (-d) % 8
    if pad_d:
        padding = [(0, 0)] * 3 + [(0, pad_d)]
        q, k, v = (jnp.pad(x, padding) for x in (q, k, v))
    out = _flash_attention(q, k, v, scale)
    if pad_d:
        out = out[..., :d]
    return out
