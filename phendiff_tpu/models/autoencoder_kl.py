"""AutoencoderKL (the SD VAE) — Flax/NHWC implementation.

Capability parity with the frozen VAE the reference uses for its SD family
(``diffusers.AutoencoderKL`` from ``stabilityai/stable-diffusion-2-1``;
encode in training ``utils_training.py:237-241``, decode in sampling
``custom_pipeline_stable_diffusion_img2img.py:709-711``).  Architecture
matches the SD-2.1 checkpoint so ``hf_import.convert_vae`` can map weights
1:1.  Latents follow the diffusers convention: ``encode`` returns a
diagonal Gaussian over 2*latent_channels moments; training/sampling scale
by ``scaling_factor``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from phendiff_tpu.ops.group_norm import group_norm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    sample_size: int = 512
    scaling_factor: float = 0.18215

    _JSON_IGNORED = (
        "_class_name", "_diffusers_version", "_name_or_path", "act_fn",
        "down_block_types", "up_block_types", "force_upcast",
        "use_quant_conv", "use_post_quant_conv", "shift_factor",
        "latents_mean", "latents_std", "mid_block_add_attention",
    )

    @classmethod
    def from_json(cls, path_or_dict) -> "AutoencoderKLConfig":
        raw = path_or_dict
        if not isinstance(raw, dict):
            with open(raw) as f:
                raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in raw.items():
            if k in cls._JSON_IGNORED:
                continue
            if k not in known:
                raise ValueError(f"unsupported VAE config key: {k}")
            kwargs[k] = tuple(v) if isinstance(v, list) else v
        return cls(**kwargs)

    def to_json_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["block_out_channels"] = list(self.block_out_channels)
        d["_class_name"] = "AutoencoderKL"
        return d


class VAEResnet(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = group_norm(x, num_groups=self.norm_num_groups, eps=1e-6,
                       scale=self.param("norm1_scale", nn.initializers.ones, (c_in,)),
                       bias=self.param("norm1_bias", nn.initializers.zeros, (c_in,)),
                       act="silu", out_dtype=self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = group_norm(h, num_groups=self.norm_num_groups, eps=1e-6,
                       scale=self.param("norm2_scale", nn.initializers.ones,
                                        (self.out_channels,)),
                       bias=self.param("norm2_bias", nn.initializers.zeros,
                                       (self.out_channels,)),
                       act="silu", out_dtype=self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (the VAE mid-block attention)."""

    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = group_norm(x, num_groups=self.norm_num_groups, eps=1e-6,
                       scale=self.param("norm_scale", nn.initializers.ones, (c,)),
                       bias=self.param("norm_bias", nn.initializers.zeros, (c,)),
                           out_dtype=self.dtype,
                       )
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        scores = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (c ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", probs, v.astype(jnp.float32))
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out.astype(self.dtype))
        return x + out.reshape(b, hh, ww, c)


class Encoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, c_out in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnet(c_out, g, self.dtype, name=f"down_{i}_res_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                # asymmetric pad + stride-2 valid conv (SD VAE downsampling)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(c_out, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(x)
        c_mid = cfg.block_out_channels[-1]
        x = VAEResnet(c_mid, g, self.dtype, name="mid_res_0")(x)
        x = VAEAttention(g, self.dtype, name="mid_attn")(x)
        x = VAEResnet(c_mid, g, self.dtype, name="mid_res_1")(x)
        x = group_norm(x, num_groups=g, eps=1e-6,
                       scale=self.param("norm_out_scale", nn.initializers.ones, (c_mid,)),
                       bias=self.param("norm_out_bias", nn.initializers.zeros, (c_mid,)),
                       act="silu", out_dtype=self.dtype)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = VAEResnet(rev[0], g, self.dtype, name="mid_res_0")(x)
        x = VAEAttention(g, self.dtype, name="mid_attn")(x)
        x = VAEResnet(rev[0], g, self.dtype, name="mid_res_1")(x)
        for i, c_out in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnet(c_out, g, self.dtype, name=f"up_{i}_res_{j}")(x)
            if i < len(rev) - 1:
                b, hh, ww, c = x.shape
                # reshape/broadcast 2x nearest upsample (jax.image.resize
                # lowers to a gather loop on TPU — see unet2d.Upsample2D)
                x = jnp.broadcast_to(
                    x[:, :, None, :, None, :], (b, hh, 2, ww, 2, c)
                ).reshape(b, hh * 2, ww * 2, c)
                x = nn.Conv(c_out, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(x)
        c_last = rev[-1]
        x = group_norm(x, num_groups=g, eps=1e-6,
                       scale=self.param("norm_out_scale", nn.initializers.ones, (c_last,)),
                       bias=self.param("norm_out_bias", nn.initializers.zeros, (c_last,)),
                       act="silu", out_dtype=self.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode(x) → (mean, logvar); decode(z) → image.  Methods are exposed
    via ``apply(..., method=...)``."""

    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: Array) -> Tuple[Array, Array]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: Array) -> Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: Array, rng: Optional[Array] = None):
        mean, logvar = self.encode(x)
        z = sample_gaussian(mean, logvar, rng) if rng is not None else mean
        return self.decode(z), mean, logvar


def sample_gaussian(mean: Array, logvar: Array, rng: Array) -> Array:
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


def encode_to_latents(
    vae: AutoencoderKL, variables, images: Array, rng: Optional[Array] = None
) -> Array:
    """images [-1,1] → scaled latents (the training-path helper,
    utils_training.py:237-241: sample posterior then × scaling_factor)."""
    mean, logvar = vae.apply(variables, images, method=AutoencoderKL.encode)
    z = sample_gaussian(mean, logvar, rng) if rng is not None else mean
    return z * vae.config.scaling_factor


def decode_from_latents(vae: AutoencoderKL, variables, latents: Array) -> Array:
    return vae.apply(
        variables, latents / vae.config.scaling_factor, method=AutoencoderKL.decode
    )
