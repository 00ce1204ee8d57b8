"""Time / class embeddings for diffusion UNets.

Functional equivalents of the reference's embedding plumbing
(``src/cond_unet_2d/cond_unet_2d.py:132-153`` — positional or Fourier time
embedding, internal class embedding summed with the timestep embedding;
``src/custom_embedding/custom_embedding.py`` — the SD class embedding).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def sinusoidal_timestep_embedding(
    timesteps: Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> Array:
    """Transformer-style sinusoidal embedding of integer timesteps → [B, dim].

    ``flip_sin_to_cos`` / ``freq_shift`` follow the conventions of the
    reference configs (``models_configs/denoiser/*.json``).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = scale * timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Random-Fourier time embedding (the reference's 'fourier' option)."""

    embedding_size: int = 256
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)  # frozen, as in the reference stack
        proj = x.astype(jnp.float32)[:, None] * w[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class TimestepEmbedMLP(nn.Module):
    """Two-layer SiLU MLP lifting the sinusoid to ``time_embed_dim``."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: Array) -> Array:
        emb = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_1",
        )(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(
            self.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_2",
        )(emb)
        return emb


class ClassEmbedding(nn.Module):
    """Learnable per-class embedding table.

    Serves both model families:
    * DDIM UNet: ``dim = time_embed_dim``, summed with the time embedding
      (reference ``cond_unet_2d.py:297-309``).
    * SD fine-tune: ``dim = 1024``, reshaped/padded to the CLIP sequence
      shape (B, 77, 1024) by the pipeline (reference
      ``custom_embedding.py:6-17`` + ``utils_training.py:480-484``).
    """

    num_classes: int
    embedding_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, class_labels: Array) -> Array:
        return nn.Embed(
            self.num_classes,
            self.embedding_dim,
            param_dtype=self.param_dtype,
            name="embedding",
        )(class_labels)


def pad_to_clip_sequence(class_emb: Array, seq_len: int = 77) -> Array:
    """(B, D) → (B, seq_len, D): the class vector in slot 0, zeros elsewhere.

    Reproduces the reference's CLIP-shape hack that feeds a single class
    embedding through SD's cross-attention (``utils_training.py:480-484``).
    """
    b, d = class_emb.shape
    out = jnp.zeros((b, seq_len, d), dtype=class_emb.dtype)
    return out.at[:, 0, :].set(class_emb)
