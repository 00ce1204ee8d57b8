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
from phendiff_tpu.ops import lane_pack
from phendiff_tpu.ops.attention import multi_head_attention
from phendiff_tpu.ops.group_norm import group_norm

Array = jax.Array


def _num_groups(channels: int, preferred: int) -> int:
    """Largest divisor of ``channels`` that is <= preferred."""
    g = min(preferred, channels)
    while channels % g:
        g -= 1
    return g


class Conv2DParams(nn.Module):
    """The parameters of an ``nn.Conv`` (same names, shapes, initializers,
    and rng paths) WITHOUT binding the convolution to the input layout:
    the lane-packed execution path builds its dense packed kernel from
    these canonical weights, so packed and unpacked execution share one
    param tree (checkpoints/EMA/converters are layout-agnostic)."""

    features: int
    in_features: int
    kernel_size: Tuple[int, int] = (3, 3)
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return kernel, bias


class ResnetBlock(nn.Module):
    """GroupNorm → SiLU → conv3x3 → (+temb) → GroupNorm → SiLU → conv3x3 + skip.

    ``packed=True`` runs the whole block on lane-packed tensors
    (ops/lane_pack.py): identical math and the SAME param tree, with the
    convs executed as dense packed kernels.  ``src_channels`` gives the
    true widths of the concatenated packed sources feeding the block (the
    up-path skip concat)."""

    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    time_scale_shift: str = "default"  # "default": add; "scale_shift": FiLM
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    packed: bool = False
    src_channels: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        p = lane_pack.P if self.packed else 1
        c_in = x.shape[-1] // p
        src = tuple(self.src_channels) if self.src_channels else (c_in,)
        assert sum(src) == c_in
        slot_ch = lane_pack.channel_of_slot(src) if self.packed else None
        if self.packed and c_in == self.out_channels and len(src) > 1:
            raise ValueError(
                "packed residual needs a shortcut conv for multi-source input"
            )

        def conv(name, cin, h, srcs, kernel=(3, 3)):
            if self.packed:
                k, b = Conv2DParams(
                    self.out_channels, cin, kernel,
                    param_dtype=self.param_dtype, name=name,
                )()
                return lane_pack.packed_conv(h, k, b, srcs, dtype=self.dtype)
            pad = 1 if kernel == (3, 3) else 0
            return nn.Conv(
                self.out_channels, kernel, padding=pad, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name,
            )(h)

        h = group_norm(
            x,
            num_groups=_num_groups(c_in, self.norm_num_groups),
            eps=self.norm_eps,
            scale=self.param("norm1_scale", nn.initializers.ones, (c_in,), self.param_dtype),
            bias=self.param("norm1_bias", nn.initializers.zeros, (c_in,), self.param_dtype),
            act="silu",
            out_dtype=self.dtype,
            packed=p,
            slot_channels=slot_ch,
        )
        h = conv("conv1", c_in, h, src)

        temb_dim = 2 * self.out_channels if self.time_scale_shift == "scale_shift" else self.out_channels
        t = nn.Dense(
            temb_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="time_emb_proj",
        )(nn.silu(temb))
        t = t[:, None, None, :]

        norm2 = dict(
            num_groups=_num_groups(self.out_channels, self.norm_num_groups),
            eps=self.norm_eps,
            scale=self.param(
                "norm2_scale", nn.initializers.ones, (self.out_channels,), self.param_dtype
            ),
            bias=self.param(
                "norm2_bias", nn.initializers.zeros, (self.out_channels,), self.param_dtype
            ),
            out_dtype=self.dtype,
            packed=p,
        )
        if self.time_scale_shift == "scale_shift":
            scale, shift = jnp.split(t, 2, axis=-1)
            if self.packed:
                scale = jnp.tile(scale, (1, 1, 1, p))
                shift = jnp.tile(shift, (1, 1, 1, p))
            h = group_norm(h, **norm2)
            h = h * (1 + scale) + shift
            h = nn.silu(h)
        else:
            if self.packed:
                t = jnp.tile(t, (1, 1, 1, p))
            h = h + t
            h = group_norm(h, act="silu", **norm2)

        h = conv("conv2", self.out_channels, h, (self.out_channels,))

        if c_in != self.out_channels:
            if self.packed:
                k, b = Conv2DParams(
                    self.out_channels, c_in, (1, 1),
                    param_dtype=self.param_dtype, name="conv_shortcut",
                )()
                x = lane_pack.packed_conv(x, k, b, src, dtype=self.dtype)
            else:
                x = nn.Conv(
                    self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_shortcut",
                )(x)
        return x + h


class SelfAttention2D(nn.Module):
    """Spatial self-attention over the (H*W) token axis of an NHWC map.

    ``packed=True`` accepts a lane-packed map: it is unpacked for the
    attention body (token order matters here) and repacked after — two
    relayout copies, acceptable because the flagship config has no
    attention at packed (narrow-channel) levels."""

    attention_head_dim: Optional[int]
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.packed:
            x = lane_pack.unpack(x)
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
        out = x + out.reshape(b, hgt, wid, c)
        if self.packed:
            out = lane_pack.pack(out)
        return out


class Downsample2D(nn.Module):
    """Stride-2 conv downsample.  ``packed_in=True`` consumes a lane-packed
    map and emits an UNPACKED one (the stride-2 output pixels map 1:1 onto
    packed cells, so the packed kernel needs only width 2)."""

    channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    packed_in: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.packed_in:
            if self.padding != 1:
                raise ValueError("packed downsample requires padding=1")
            k, b = Conv2DParams(
                self.channels, x.shape[-1] // lane_pack.P, (3, 3),
                param_dtype=self.param_dtype, name="conv",
            )()
            return lane_pack.packed_downsample_conv(x, k, b, dtype=self.dtype)
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
    """2x nearest upsample + 3x3 conv.  ``packed_out=True`` consumes the
    UNPACKED input and emits a lane-PACKED map directly (same params, same
    math): the conv runs over the original W grid with a parity-expanded
    kernel, which removes both of the biggest relayouts in the up path —
    the 2x2 broadcast materialization halves (rows only) and the
    ``upsample → pack`` copy disappears (ops/lane_pack.py r3 audit)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    packed_out: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        if self.packed_out:
            k, bia = Conv2DParams(
                self.channels, c, (3, 3),
                param_dtype=self.param_dtype, name="conv",
            )()
            return lane_pack.packed_upsample_conv(x, k, bia, dtype=self.dtype)
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
    # Lane-packed execution of narrow-channel levels (2*C <= 128 and even
    # width): identical math and param tree, ~2x less HBM traffic and full
    # MXU lanes on those levels' convs (ops/lane_pack.py; measured +25%
    # end-to-end on the 128px flagship — docs/BENCHMARKS.md r3).
    lane_pack: bool = False

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

        # lane packing: which levels run W-packed (narrow channels + even
        # width at that level); per-tensor packed-ness is tracked alongside
        n_levels = len(cfg.block_out_channels)
        w0 = x.shape[2]
        packed_lv = [
            self.lane_pack
            and lane_pack.P * c <= 128
            and (w0 >> i) % lane_pack.P == 0
            and (w0 >> i) >= lane_pack.P
            for i, c in enumerate(cfg.block_out_channels)
        ]

        def to_packing(t, is_packed, want):
            if want and not is_packed:
                return lane_pack.pack(t)
            if is_packed and not want:
                return lane_pack.unpack(t)
            return t

        def res_args(c_out, pk, src=None, name=None):
            return dict(
                out_channels=c_out,
                norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps,
                time_scale_shift=cfg.resnet_time_scale_shift,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                packed=pk,
                src_channels=src,
                name=name,
            )

        def attn_args(pk, name):
            return dict(
                attention_head_dim=cfg.attention_head_dim,
                norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                packed=pk,
                name=name,
            )

        # --- down path ------------------------------------------------------
        if packed_lv[0]:
            k, bia = Conv2DParams(
                cfg.block_out_channels[0], x.shape[-1], (3, 3),
                param_dtype=self.param_dtype, name="conv_in",
            )()
            x = lane_pack.packed_conv(
                lane_pack.pack(x), k, bia, (x.shape[-1],), dtype=self.dtype
            )
        else:
            x = nn.Conv(
                cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_in",
            )(x)
        x_pk = packed_lv[0]
        skips = [(x, x_pk)]
        for i, (btype, c_out) in enumerate(
            zip(cfg.down_block_types, cfg.block_out_channels)
        ):
            pk = packed_lv[i]
            x = to_packing(x, x_pk, pk)
            x_pk = pk
            for j in range(cfg.layers_per_block):
                x = ResBlk(**res_args(c_out, pk, name=f"down_{i}_res_{j}"))(x, temb)
                if btype == "AttnDownBlock2D":
                    x = AttnBlk(**attn_args(pk, f"down_{i}_attn_{j}"))(x)
                skips.append((x, pk))
            if i < n_levels - 1:
                if pk and cfg.downsample_padding == 1:
                    x = Downsample2D(
                        c_out, padding=1, dtype=self.dtype,
                        param_dtype=self.param_dtype, packed_in=True,
                        name=f"down_{i}_downsample",
                    )(x)
                else:
                    x = Downsample2D(
                        c_out, padding=cfg.downsample_padding, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"down_{i}_downsample",
                    )(to_packing(x, pk, False))
                x_pk = False
                skips.append((x, False))

        # --- mid ------------------------------------------------------------
        c_mid = cfg.block_out_channels[-1]
        pk_mid = packed_lv[-1]
        x = to_packing(x, x_pk, pk_mid)
        x_pk = pk_mid
        x = ResBlk(**res_args(c_mid, pk_mid, name="mid_res_0"))(x, temb)
        x = AttnBlk(**attn_args(pk_mid, "mid_attn"))(x)
        x = ResBlk(**res_args(c_mid, pk_mid, name="mid_res_1"))(x, temb)
        if cfg.mid_block_scale_factor != 1.0:
            x = x * cfg.mid_block_scale_factor

        # --- up path --------------------------------------------------------
        rev_channels = tuple(reversed(cfg.block_out_channels))
        for i, (btype, c_out) in enumerate(zip(cfg.up_block_types, rev_channels)):
            pk = packed_lv[n_levels - 1 - i]
            x = to_packing(x, x_pk, pk)
            x_pk = pk
            for j in range(cfg.layers_per_block + 1):
                skip, skip_pk = skips.pop()
                skip = to_packing(skip, skip_pk, pk)
                p = lane_pack.P if pk else 1
                src = (x.shape[-1] // p, skip.shape[-1] // p)
                x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
                x = ResBlk(
                    **res_args(c_out, pk, src=src if pk else None,
                               name=f"up_{i}_res_{j}")
                )(x, temb)
                if btype == "AttnUpBlock2D":
                    x = AttnBlk(**attn_args(pk, f"up_{i}_attn_{j}"))(x)
            if i < len(cfg.up_block_types) - 1:
                x = to_packing(x, x_pk, False)
                # emit packed directly when the next (finer) level runs
                # packed — see Upsample2D.packed_out
                nxt = packed_lv[n_levels - 2 - i]
                x = Upsample2D(
                    c_out, dtype=self.dtype, param_dtype=self.param_dtype,
                    packed_out=nxt, name=f"up_{i}_upsample",
                )(x)
                x_pk = nxt
        assert not skips, f"{len(skips)} unconsumed skip connections"

        # --- out ------------------------------------------------------------
        p = lane_pack.P if x_pk else 1
        c = x.shape[-1] // p
        x = group_norm(
            x,
            num_groups=_num_groups(c, cfg.norm_num_groups),
            eps=cfg.norm_eps,
            scale=self.param("norm_out_scale", nn.initializers.ones, (c,), self.param_dtype),
            bias=self.param("norm_out_bias", nn.initializers.zeros, (c,), self.param_dtype),
            act="silu",
            out_dtype=self.dtype,
            packed=p,
        )
        if x_pk:
            k, bia = Conv2DParams(
                cfg.out_channels, c, (3, 3),
                param_dtype=self.param_dtype, name="conv_out",
            )()
            x = lane_pack.unpack(
                lane_pack.packed_conv(x, k, bia, (c,), dtype=self.dtype)
            )
        else:
            x = nn.Conv(
                cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_out",
            )(x)
        return x.astype(sample.dtype)
