"""Multi-head attention op with an XLA path and a Pallas TPU kernel path.

The reference inherits attention from diffusers' CUDA blocks
(``cond_unet_2d.py:19-26`` via ``AttnDownBlock2D``/``UNetMidBlock2D``).
Here attention is a standalone op: callers hand us [B, S, H, D] tensors and
we pick the best implementation for the platform:

* ``xla``   — einsum + f32 softmax; XLA fuses this well and it is the
              reference semantics for all tests.
* ``pallas`` — fused flash-style kernel (see ``phendiff_tpu/ops/flash_attention.py``)
              used on TPU for large sequence lengths where materializing the
              S×S score matrix wastes HBM bandwidth.

Softmax is always computed in float32 regardless of input dtype (the
reference sets ``upcast_attention=True`` for the SD-size config).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Sequence length above which the fused kernel pays off (128px latents → 256
# tokens fit VMEM easily either way; the kernel matters at ≥1024 tokens).
_PALLAS_MIN_SEQ = 1024

# Global override: "auto" (default), "xla", or "pallas".
_IMPL_ENV = "PHENDIFF_ATTN_IMPL"

# Tensor-parallel context: when a mesh is registered (Trainer does this for
# model_parallel > 1), the fused kernel runs under shard_map — heads over
# the model axis, batch over the data axis.  Heads are embarrassingly
# parallel, so the per-device kernel needs NO communication; GSPMD inserts
# whatever resharding the surrounding program requires at the shard_map
# boundary.  Without this, a pallas_call has no GSPMD partitioning rule and
# TP programs had to fall back to the ~2.7x-slower XLA attention
# (docs/BENCHMARKS.md r2 ablation).
_TP_STATE = {"mesh": None}


def set_tp_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh for tensor-parallel programs."""
    _TP_STATE["mesh"] = mesh


def _tp_shard_spec(mesh, q):
    """(in/out PartitionSpec) for [B,S,H,D] under the registered mesh, or
    None when the shapes don't divide (caller falls back to XLA)."""
    from jax.sharding import PartitionSpec as P

    from phendiff_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    b, _, h, _ = q.shape
    dp = mesh.shape.get(DATA_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1)
    if b % dp or h % tp:
        return None
    return P(
        DATA_AXIS if dp > 1 else None, None,
        MODEL_AXIS if tp > 1 else None, None,
    )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def attention_xla(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None
) -> Array:
    """[B, S, H, D] q/k/v → [B, S, H, D].

    Matmuls keep the input dtype (bf16 under mixed precision → full MXU
    rate) with float32 accumulation via ``preferred_element_type``; the
    softmax itself is always float32.  Upcasting the *inputs* to f32 would
    run the matmuls at a fraction of MXU throughput for no accuracy gain —
    accumulation is what matters.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * jnp.asarray(scale, q.dtype), k,
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def multi_head_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: Optional[float] = None,
    implementation: Optional[str] = None,
) -> Array:
    """Dispatch between XLA and Pallas implementations.

    implementation: None (auto) | "xla" | "pallas".
    """
    forced_by_env = False
    if implementation is None:
        env = os.environ.get(_IMPL_ENV, "auto")
        if env in ("xla", "pallas"):
            implementation = env
            forced_by_env = True
        else:
            use_pallas = (
                _on_tpu()
                and q.shape[1] >= _PALLAS_MIN_SEQ
                and q.shape[1] == k.shape[1]
            )
            implementation = "pallas" if use_pallas else "xla"
    if implementation == "pallas" and q.shape[1] != k.shape[1]:
        # the fused kernel is self-attention only (its grid/ones-row sizing
        # assumes s_q == s_kv); cross-attention (s_kv=77) must not reach it
        if forced_by_env:
            implementation = "xla"  # env override is a preference, not a demand
        else:
            raise ValueError(
                "implementation='pallas' does not support cross-attention "
                f"(s_q={q.shape[1]} != s_kv={k.shape[1]}); use the XLA path"
            )
    if implementation == "xla":
        return attention_xla(q, k, v, scale=scale)
    if implementation == "pallas":
        from phendiff_tpu.ops.flash_attention import flash_attention

        mesh = _TP_STATE["mesh"]
        if mesh is not None:
            spec = _tp_shard_spec(mesh, q)
            if spec is None:  # non-dividing shapes: XLA handles any sharding
                return attention_xla(q, k, v, scale=scale)
            try:
                from jax import shard_map
            except ImportError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map

            kw = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
            body = functools.partial(flash_attention, scale=scale)
            try:
                # pallas_call carries no varying-mesh-axes metadata; the
                # specs above ARE the replication statement
                f = shard_map(body, check_vma=False, **kw)
            except TypeError:  # older jax spelling
                f = shard_map(body, check_rep=False, **kw)
            return f(q, k, v)
        return flash_attention(q, k, v, scale=scale)
    raise ValueError(f"unknown attention implementation: {implementation}")
