"""UNet2DCondition (SD-2.1-style) — Flax/NHWC implementation.

Capability parity with the ``UNet2DConditionModel`` the reference fine-tunes
for its SD family (``utils_models.py:67-122``; forward with the custom
class embedding as ``encoder_hidden_states``, ``utils_training.py:490-494``).
Architecture matches the SD-2.1 checkpoint layout (CrossAttn down/up blocks
with Transformer2D inner blocks, GEGLU feed-forward, linear projections,
head counts per level) so ``hf_import.convert_sd_unet`` maps weights 1:1.

Conditioning contract (the cross-model API difference called out in
SURVEY.md §3.5): this model conditions via a (B, 77, 1024) sequence fed to
cross-attention — the class embedding padded to CLIP shape by
``embeddings.pad_to_clip_sequence`` — whereas the pixel-space DDIM UNet
adds its class embedding to the timestep embedding.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from phendiff_tpu.models.embeddings import (
    TimestepEmbedMLP,
    sinusoidal_timestep_embedding,
)
from phendiff_tpu.models.unet2d import Downsample2D, ResnetBlock, Upsample2D
from phendiff_tpu.ops.attention import multi_head_attention
from phendiff_tpu.ops.group_norm import group_norm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    sample_size: int = 96
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    # heads per level (SD-2.1: [5, 10, 20, 20] → head_dim 64 everywhere)
    attention_head_dim: Union[int, Tuple[int, ...]] = (5, 10, 20, 20)
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    use_linear_projection: bool = True
    upcast_attention: bool = True
    downsample_padding: int = 1

    def heads_at(self, level: int) -> int:
        a = self.attention_head_dim
        return a if isinstance(a, int) else a[level]

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    _JSON_IGNORED = (
        "_class_name", "_diffusers_version", "_name_or_path", "act_fn",
        "center_input_sample", "mid_block_scale_factor", "dual_cross_attention",
        "mid_block_type", "only_cross_attention", "num_class_embeds",
        "class_embed_type", "addition_embed_type", "resnet_time_scale_shift",
        "projection_class_embeddings_input_dim", "conv_in_kernel",
        "conv_out_kernel", "time_embedding_type", "timestep_post_act",
        "time_cond_proj_dim", "attention_type", "addition_time_embed_dim",
        "addition_embed_type_num_heads", "cross_attention_norm",
        "encoder_hid_dim", "encoder_hid_dim_type", "class_embeddings_concat",
        "mid_block_only_cross_attention", "num_attention_heads",
        "reverse_transformer_layers_per_block", "transformer_layers_per_block",
        "dropout", "time_embedding_dim", "time_embedding_act_fn",
    )

    @classmethod
    def from_json(cls, path_or_dict) -> "SDUNetConfig":
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
                raise ValueError(f"unsupported SD UNet config key: {k}")
            kwargs[k] = tuple(v) if isinstance(v, list) else v
        return cls(**kwargs)

    def to_json_dict(self) -> dict:
        d = dataclasses.asdict(self)
        for k, v in list(d.items()):
            if isinstance(v, tuple):
                d[k] = list(v)
        d["_class_name"] = "UNet2DConditionModel"
        return d

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class CrossAttention(nn.Module):
    """Multi-head attention; self- or cross- depending on `context`."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        out = multi_head_attention(q, k, v).reshape(b, sq, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        h = nn.Dense(8 * c, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(c, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, name=name)
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dtype,
                               name="attn1")(ln("norm1")(x).astype(self.dtype))
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dtype,
                               name="attn2")(
            ln("norm2")(x).astype(self.dtype), context
        )
        x = x + GEGLUFeedForward(self.dtype, name="ff")(
            ln("norm3")(x).astype(self.dtype)
        )
        return x


class Transformer2D(nn.Module):
    """GroupNorm → (linear|conv) proj_in → transformer block → proj_out + res."""

    num_heads: int
    head_dim: int
    norm_num_groups: int = 32
    use_linear_projection: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, hh, ww, c = x.shape
        h = group_norm(
            x, num_groups=self.norm_num_groups, eps=1e-6,
            scale=self.param("norm_scale", nn.initializers.ones, (c,)),
            bias=self.param("norm_bias", nn.initializers.zeros, (c,)),
            out_dtype=self.dtype,
        )
        h = h.reshape(b, hh * ww, c)
        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(
                h.reshape(b, hh, ww, c)
            ).reshape(b, hh * ww, c)
        h = BasicTransformerBlock(
            self.num_heads, self.head_dim, self.dtype, name="block_0"
        )(h, context)
        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hh, ww, c)
        else:
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(
                h.reshape(b, hh, ww, c)
            )
        return x + h


class SDUNet(nn.Module):
    """forward(sample, timesteps, encoder_hidden_states) → epsilon/v output.

    ``remat=True`` rematerializes resnet/transformer blocks in backward
    (activation-memory vs FLOPs trade for fine-tuning)."""

    config: SDUNetConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: Array,  # [B, h, w, 4] latents
        timesteps: Array,  # [] or [B]
        encoder_hidden_states: Array,  # [B, 77, cross_attention_dim]
    ) -> Array:
        cfg = self.config
        x = sample.astype(self.dtype)
        ctx = encoder_hidden_states.astype(self.dtype)
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        temb = sinusoidal_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
        )
        temb = TimestepEmbedMLP(
            cfg.time_embed_dim, dtype=self.dtype, name="time_embedding"
        )(temb.astype(self.dtype))

        head_dim_of = lambda ch, lvl: ch // cfg.heads_at(lvl)

        ResBlk = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        Xfmr = nn.remat(Transformer2D) if self.remat else Transformer2D

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        skips = [x]
        for i, (btype, c_out) in enumerate(
            zip(cfg.down_block_types, cfg.block_out_channels)
        ):
            for j in range(cfg.layers_per_block):
                x = ResBlk(
                    c_out, norm_num_groups=cfg.norm_num_groups,
                    norm_eps=cfg.norm_eps, dtype=self.dtype,
                    name=f"down_{i}_res_{j}",
                )(x, temb)
                if btype == "CrossAttnDownBlock2D":
                    x = Xfmr(
                        cfg.heads_at(i), head_dim_of(c_out, i),
                        cfg.norm_num_groups, cfg.use_linear_projection,
                        self.dtype, name=f"down_{i}_attn_{j}",
                    )(x, ctx)
                skips.append(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample2D(
                    c_out, padding=cfg.downsample_padding, dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(x)
                skips.append(x)

        c_mid = cfg.block_out_channels[-1]
        lvl_mid = len(cfg.block_out_channels) - 1
        x = ResBlk(c_mid, norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps, dtype=self.dtype,
                        name="mid_res_0")(x, temb)
        x = Xfmr(
            cfg.heads_at(lvl_mid), head_dim_of(c_mid, lvl_mid),
            cfg.norm_num_groups, cfg.use_linear_projection, self.dtype,
            name="mid_attn",
        )(x, ctx)
        x = ResBlk(c_mid, norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps, dtype=self.dtype,
                        name="mid_res_1")(x, temb)

        rev_channels = tuple(reversed(cfg.block_out_channels))
        for i, (btype, c_out) in enumerate(zip(cfg.up_block_types, rev_channels)):
            lvl = len(cfg.block_out_channels) - 1 - i
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
                x = ResBlk(
                    c_out, norm_num_groups=cfg.norm_num_groups,
                    norm_eps=cfg.norm_eps, dtype=self.dtype,
                    name=f"up_{i}_res_{j}",
                )(x, temb)
                if btype == "CrossAttnUpBlock2D":
                    x = Xfmr(
                        cfg.heads_at(lvl), head_dim_of(c_out, lvl),
                        cfg.norm_num_groups, cfg.use_linear_projection,
                        self.dtype, name=f"up_{i}_attn_{j}",
                    )(x, ctx)
            if i < len(cfg.up_block_types) - 1:
                x = Upsample2D(c_out, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        assert not skips

        c = x.shape[-1]
        x = group_norm(
            x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            scale=self.param("norm_out_scale", nn.initializers.ones, (c,)),
            bias=self.param("norm_out_bias", nn.initializers.zeros, (c,)),
            act="silu",
            out_dtype=self.dtype,
        )
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x.astype(sample.dtype)
