"""Conditional UNet2D denoiser — TPU-native Flax implementation.

Capability parity with the reference's ``CustomCondUNet2DModel``
(``src/cond_unet_2d/cond_unet_2d.py:74-362``): a DDPM-style UNet whose
class conditioning is *added to the timestep embedding*, accepting either
integer ``class_labels`` (embedded internally) or a precomputed
``class_emb`` tensor — the latter is how the CFG unconditional pass feeds a
zeros embedding (``pipeline_conditionial_ddim.py:310-317``).

TPU-first design decisions (not a translation):

* **NHWC layout** throughout — the native layout for XLA:TPU convolutions
  (the reference is NCHW torch).  Conversion happens only at file-IO
  boundaries.
* Everything is shape-static and trace-once: no Python branching on tensor
  values, so a sampler can ``lax.scan`` over timesteps with this module
  inlined, and CFG traces both branches without the reference's DDP
  ``find_unused_parameters`` workaround (``train.py:59-66``).
* GroupNorm statistics are computed in float32 even under bf16 compute.
* Attention runs through ``phendiff_tpu.ops.multi_head_attention`` which
  dispatches to a fused Pallas kernel on TPU for long sequences.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from phendiff_tpu.models.config import UNet2DConfig
from phendiff_tpu.models.embeddings import (
    GaussianFourierProjection,
    TimestepEmbedMLP,
    sinusoidal_timestep_embedding,
)
from phendiff_tpu.ops.attention import multi_head_attention
from phendiff_tpu.ops.group_norm import group_norm

Array = jax.Array


def _num_groups(channels: int, preferred: int) -> int:
    """Largest divisor of ``channels`` that is <= preferred."""
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


class ResnetBlock(nn.Module):
    """GroupNorm → SiLU → conv3x3 → (+temb) → GroupNorm → SiLU → conv3x3 + skip."""

    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    time_scale_shift: str = "default"  # "default": add; "scale_shift": FiLM
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        c_in = x.shape[-1]
        h = group_norm(
            x,
            num_groups=_num_groups(c_in, self.norm_num_groups),
            eps=self.norm_eps,
            scale=self.param("norm1_scale", nn.initializers.ones, (c_in,), self.param_dtype),
            bias=self.param("norm1_bias", nn.initializers.zeros, (c_in,), self.param_dtype),
            act="silu",
            out_dtype=self.dtype,
        )
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv1",
        )(h)

        temb_dim = 2 * self.out_channels if self.time_scale_shift == "scale_shift" else self.out_channels
        t = nn.Dense(
            temb_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_emb_proj",
        )(nn.silu(temb))
        t = t[:, None, None, :]

        if self.time_scale_shift == "scale_shift":
            scale, shift = jnp.split(t, 2, axis=-1)
            h = group_norm(
                h,
                num_groups=_num_groups(self.out_channels, self.norm_num_groups),
                eps=self.norm_eps,
                scale=self.param(
                    "norm2_scale", nn.initializers.ones, (self.out_channels,), self.param_dtype
                ),
                bias=self.param(
                    "norm2_bias", nn.initializers.zeros, (self.out_channels,), self.param_dtype
                ),
                out_dtype=self.dtype,
            )
            h = h * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + t
            h = group_norm(
                h,
                num_groups=_num_groups(self.out_channels, self.norm_num_groups),
                eps=self.norm_eps,
                scale=self.param(
                    "norm2_scale", nn.initializers.ones, (self.out_channels,), self.param_dtype
                ),
                bias=self.param(
                    "norm2_bias", nn.initializers.zeros, (self.out_channels,), self.param_dtype
                ),
                act="silu",
                out_dtype=self.dtype,
            )

        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv2",
        )(h)

        if c_in != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_shortcut",
            )(x)
        return x + h


class SelfAttention2D(nn.Module):
    """Spatial self-attention over the (H*W) token axis of an NHWC map."""

    attention_head_dim: Optional[int]
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, hgt, wid, c = x.shape
        # attention_head_dim is the per-head dim; None → single head over all
        # channels (matches the orig-google-ddpm config with null head dim).
        head_dim = self.attention_head_dim or c
        num_heads = max(c // head_dim, 1)
        head_dim = c // num_heads

        h = group_norm(
            x,
            num_groups=_num_groups(c, self.norm_num_groups),
            eps=self.norm_eps,
            scale=self.param("norm_scale", nn.initializers.ones, (c,), self.param_dtype),
            bias=self.param("norm_bias", nn.initializers.zeros, (c,), self.param_dtype),
            out_dtype=self.dtype,
        )
        h = h.reshape(b, hgt * wid, c)

        qkv = nn.Dense(
            3 * c, dtype=self.dtype, param_dtype=self.param_dtype, name="qkv"
        )(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, hgt * wid, num_heads, head_dim)
        k = k.reshape(b, hgt * wid, num_heads, head_dim)
        v = v.reshape(b, hgt * wid, num_heads, head_dim)
        attn = multi_head_attention(q, k, v)
        attn = attn.reshape(b, hgt * wid, c)
        out = nn.Dense(
            c, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out"
        )(attn)
        return x + out.reshape(b, hgt, wid, c)


class Downsample2D(nn.Module):
    channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.padding == 0:
            # asymmetric (0,1)x(0,1) pad, as the reference stack uses when
            # downsample_padding=0 (orig-google-ddpm config)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = self.padding
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        # 2x nearest upsample as reshape+broadcast: jax.image.resize lowers
        # to a gather/while-loop on TPU (profiled at ~1.9 ms/forward on the
        # flagship); the broadcast form is a pure copy XLA fuses away.
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
        ).reshape(b, h * 2, w * 2, c)
        return nn.Conv(
            self.channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)


class CondUNet2D(nn.Module):
    """Class-conditional pixel-space UNet (the DDIM model family's denoiser).

    ``remat=True`` rematerializes each resnet/attention block in backward
    (``jax.checkpoint``): activations are recomputed instead of stored,
    trading ~30% more forward FLOPs for the activation memory that
    otherwise caps the training batch (the 16 GB v5e OOMs at batch 64 @
    128px without it).
    """

    config: UNet2DConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: Array,  # [B, H, W, C] in [-1, 1]
        timesteps: Array,  # [] or [B] int
        class_labels: Optional[Array] = None,  # [B] int
        class_emb: Optional[Array] = None,  # [B, time_embed_dim] precomputed
    ) -> Array:
        cfg = self.config
        ted = cfg.time_embed_dim
        x = sample.astype(self.dtype)
        if cfg.center_input_sample:
            x = 2.0 * x - 1.0

        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        # --- time embedding -------------------------------------------------
        if cfg.time_embedding_type == "fourier":
            temb = GaussianFourierProjection(
                embedding_size=cfg.block_out_channels[0], name="time_proj"
            )(timesteps)
        else:
            temb = sinusoidal_timestep_embedding(
                timesteps,
                cfg.block_out_channels[0],
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                freq_shift=cfg.freq_shift,
            )
        temb = TimestepEmbedMLP(
            ted, dtype=self.dtype, param_dtype=self.param_dtype, name="time_embedding"
        )(temb.astype(self.dtype))

        # --- class conditioning: summed with the time embedding -------------
        # (reference contract, cond_unet_2d.py:297-309: exactly one of
        # class_labels / class_emb is used; class_emb lets CFG pass zeros)
        if class_emb is not None:
            cemb = class_emb.astype(self.dtype)
            temb = temb + cemb
        elif class_labels is not None:
            if cfg.num_class_embeds is None:
                raise ValueError("model is unconditional: no num_class_embeds")
            cemb = nn.Embed(
                cfg.num_class_embeds, ted, param_dtype=self.param_dtype,
                name="class_embedding",
            )(class_labels).astype(self.dtype)
            temb = temb + cemb
        elif cfg.num_class_embeds is not None:
            raise ValueError(
                "conditional model requires class_labels or class_emb"
            )

        # remat blocks for training memory (see class docstring)
        ResBlk = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        AttnBlk = nn.remat(SelfAttention2D) if self.remat else SelfAttention2D

        # --- down path ------------------------------------------------------
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_in",
        )(x)
        skips = [x]
        for i, (btype, c_out) in enumerate(
            zip(cfg.down_block_types, cfg.block_out_channels)
        ):
            for j in range(cfg.layers_per_block):
                x = ResBlk(
                    c_out,
                    norm_num_groups=cfg.norm_num_groups,
                    norm_eps=cfg.norm_eps,
                    time_scale_shift=cfg.resnet_time_scale_shift,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"down_{i}_res_{j}",
                )(x, temb)
                if btype == "AttnDownBlock2D":
                    x = AttnBlk(
                        cfg.attention_head_dim,
                        norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"down_{i}_attn_{j}",
                    )(x)
                skips.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample2D(
                    c_out, padding=cfg.downsample_padding, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"down_{i}_downsample",
                )(x)
                skips.append(x)

        # --- mid ------------------------------------------------------------
        c_mid = cfg.block_out_channels[-1]
        x = ResBlk(
            c_mid, norm_num_groups=cfg.norm_num_groups, norm_eps=cfg.norm_eps,
            time_scale_shift=cfg.resnet_time_scale_shift, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mid_res_0",
        )(x, temb)
        x = AttnBlk(
            cfg.attention_head_dim, norm_num_groups=cfg.norm_num_groups,
            norm_eps=cfg.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mid_attn",
        )(x)
        x = ResBlk(
            c_mid, norm_num_groups=cfg.norm_num_groups, norm_eps=cfg.norm_eps,
            time_scale_shift=cfg.resnet_time_scale_shift, dtype=self.dtype,
            param_dtype=self.param_dtype, name="mid_res_1",
        )(x, temb)
        if cfg.mid_block_scale_factor != 1.0:
            x = x * cfg.mid_block_scale_factor

        # --- up path --------------------------------------------------------
        rev_channels = tuple(reversed(cfg.block_out_channels))
        for i, (btype, c_out) in enumerate(zip(cfg.up_block_types, rev_channels)):
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
                x = ResBlk(
                    c_out,
                    norm_num_groups=cfg.norm_num_groups,
                    norm_eps=cfg.norm_eps,
                    time_scale_shift=cfg.resnet_time_scale_shift,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"up_{i}_res_{j}",
                )(x, temb)
                if btype == "AttnUpBlock2D":
                    x = AttnBlk(
                        cfg.attention_head_dim,
                        norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"up_{i}_attn_{j}",
                    )(x)
            if i < len(cfg.up_block_types) - 1:
                x = Upsample2D(
                    c_out, dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"up_{i}_upsample",
                )(x)
        assert not skips, f"{len(skips)} unconsumed skip connections"

        # --- out ------------------------------------------------------------
        c = x.shape[-1]
        x = group_norm(
            x,
            num_groups=_num_groups(c, cfg.norm_num_groups),
            eps=cfg.norm_eps,
            scale=self.param("norm_out_scale", nn.initializers.ones, (c,), self.param_dtype),
            bias=self.param("norm_out_bias", nn.initializers.zeros, (c,), self.param_dtype),
            act="silu",
            out_dtype=self.dtype,
        )
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_out",
        )(x)
        return x.astype(sample.dtype)
