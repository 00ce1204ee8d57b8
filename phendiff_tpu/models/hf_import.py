"""Bidirectional diffusers↔Flax weight conversion.

The reference's SD family loads ``stabilityai/stable-diffusion-2-1``
weights through diffusers (``utils_models.py:67-122``).  This module maps
diffusers/torch state-dict keys to our Flax module trees and back, for all
three model families:

* ``CondUNet2D``      ↔ ``UNet2DModel`` naming (down_blocks.N.resnets.M...)
* ``SDUNet``          ↔ ``UNet2DConditionModel`` naming (transformer blocks)
* ``AutoencoderKL``   ↔ ``AutoencoderKL`` naming (encoder/decoder/mid)

Conventions: torch conv OIHW → flax HWIO; torch linear [out,in] → flax
kernel [in,out]; norm weight/bias → scale/bias; our fused qkv Dense in the
pixel UNet splits into diffusers' separate to_q/to_k/to_v.

Round-trip (export → import) is tested exactly; importing real checkpoints
additionally requires a weights file on disk (zero-egress environment).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
from phendiff_tpu.models.config import UNet2DConfig
from phendiff_tpu.models.sd_unet import SDUNetConfig

PyTree = Any


def _get(tree: PyTree, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def _set(tree: PyTree, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _conv_pairs(ours: str, theirs: str):
    """(our_path, their_key, kind) for a conv layer."""
    return [
        (f"{ours}/kernel", f"{theirs}.weight", "conv"),
        (f"{ours}/bias", f"{theirs}.bias", "none"),
    ]


def _dense_pairs(ours: str, theirs: str, bias: bool = True):
    out = [(f"{ours}/kernel", f"{theirs}.weight", "dense")]
    if bias:
        out.append((f"{ours}/bias", f"{theirs}.bias", "none"))
    return out


def _norm_pairs(ours_prefix: str, theirs: str):
    return [
        (f"{ours_prefix}_scale", f"{theirs}.weight", "none"),
        (f"{ours_prefix}_bias", f"{theirs}.bias", "none"),
    ]


def _resnet_pairs(ours: str, theirs: str, has_shortcut: bool):
    pairs = []
    pairs += _norm_pairs(f"{ours}/norm1", f"{theirs}.norm1")
    pairs += _conv_pairs(f"{ours}/conv1", f"{theirs}.conv1")
    pairs += _dense_pairs(f"{ours}/time_emb_proj", f"{theirs}.time_emb_proj")
    pairs += _norm_pairs(f"{ours}/norm2", f"{theirs}.norm2")
    pairs += _conv_pairs(f"{ours}/conv2", f"{theirs}.conv2")
    if has_shortcut:
        pairs += _conv_pairs(f"{ours}/conv_shortcut", f"{theirs}.conv_shortcut")
    return pairs


def _vae_resnet_pairs(ours: str, theirs: str, has_shortcut: bool):
    pairs = []
    pairs += _norm_pairs(f"{ours}/norm1", f"{theirs}.norm1")
    pairs += _conv_pairs(f"{ours}/conv1", f"{theirs}.conv1")
    pairs += _norm_pairs(f"{ours}/norm2", f"{theirs}.norm2")
    pairs += _conv_pairs(f"{ours}/conv2", f"{theirs}.conv2")
    if has_shortcut:
        pairs += _conv_pairs(f"{ours}/conv_shortcut", f"{theirs}.conv_shortcut")
    return pairs


# ---------------------------------------------------------------------------
# CondUNet2D ↔ UNet2DModel
# ---------------------------------------------------------------------------


def _unet2d_plan(cfg: UNet2DConfig) -> list:
    """List of (our_path, their_key, kind) plus special fused-qkv entries."""
    plan = []
    plan += _conv_pairs("conv_in", "conv_in")
    plan += _dense_pairs("time_embedding/linear_1", "time_embedding.linear_1")
    plan += _dense_pairs("time_embedding/linear_2", "time_embedding.linear_2")
    if cfg.num_class_embeds is not None:
        plan.append(("class_embedding/embedding", "class_embedding.weight", "none"))

    chans = cfg.block_out_channels
    prev = chans[0]
    for i, (btype, c_out) in enumerate(zip(cfg.down_block_types, chans)):
        for j in range(cfg.layers_per_block):
            c_in = prev if j == 0 else c_out
            plan += _resnet_pairs(
                f"down_{i}_res_{j}", f"down_blocks.{i}.resnets.{j}", c_in != c_out
            )
            if btype == "AttnDownBlock2D":
                plan.append((f"down_{i}_attn_{j}", f"down_blocks.{i}.attentions.{j}", "attn"))
        if i < len(chans) - 1:
            plan += _conv_pairs(
                f"down_{i}_downsample/conv", f"down_blocks.{i}.downsamplers.0.conv"
            )
        prev = c_out

    c_mid = chans[-1]
    plan += _resnet_pairs("mid_res_0", "mid_block.resnets.0", False)
    plan.append(("mid_attn", "mid_block.attentions.0", "attn"))
    plan += _resnet_pairs("mid_res_1", "mid_block.resnets.1", False)

    rev = tuple(reversed(chans))
    for i, (btype, c_out) in enumerate(zip(cfg.up_block_types, rev)):
        prev_out = rev[i - 1] if i > 0 else c_mid
        for j in range(cfg.layers_per_block + 1):
            # concat input channels always differ from c_out → shortcut exists
            plan += _resnet_pairs(
                f"up_{i}_res_{j}", f"up_blocks.{i}.resnets.{j}", True
            )
            if btype == "AttnUpBlock2D":
                plan.append((f"up_{i}_attn_{j}", f"up_blocks.{i}.attentions.{j}", "attn"))
        if i < len(rev) - 1:
            plan += _conv_pairs(
                f"up_{i}_upsample/conv", f"up_blocks.{i}.upsamplers.0.conv"
            )
    plan += _norm_pairs("norm_out", "conv_norm_out")
    plan += _conv_pairs("conv_out", "conv_out")
    return plan


def _export_leaf(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(arr, (3, 2, 0, 1))  # HWIO → OIHW
    if kind == "dense":
        return np.transpose(arr)
    return arr


def _import_leaf(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":
        return np.transpose(arr, (2, 3, 1, 0))  # OIHW → HWIO
    if kind == "dense":
        return np.transpose(arr)
    return arr


def _export_attn(sub: PyTree, theirs: str, out: Dict[str, np.ndarray]):
    """Our fused-qkv SelfAttention2D → diffusers Attention (to_q/k/v/out.0)."""
    out[f"{theirs}.group_norm.weight"] = np.asarray(sub["norm_scale"])
    out[f"{theirs}.group_norm.bias"] = np.asarray(sub["norm_bias"])
    qkv_k = np.asarray(sub["qkv"]["kernel"])  # [C, 3C]
    qkv_b = np.asarray(sub["qkv"]["bias"])
    c = qkv_k.shape[0]
    for idx, name in enumerate(("to_q", "to_k", "to_v")):
        out[f"{theirs}.{name}.weight"] = np.transpose(
            qkv_k[:, idx * c : (idx + 1) * c]
        )
        out[f"{theirs}.{name}.bias"] = qkv_b[idx * c : (idx + 1) * c]
    out[f"{theirs}.to_out.0.weight"] = np.transpose(np.asarray(sub["proj_out"]["kernel"]))
    out[f"{theirs}.to_out.0.bias"] = np.asarray(sub["proj_out"]["bias"])


def _import_attn(sd: Dict[str, np.ndarray], theirs: str) -> PyTree:
    q = np.transpose(np.asarray(sd[f"{theirs}.to_q.weight"]))
    k = np.transpose(np.asarray(sd[f"{theirs}.to_k.weight"]))
    v = np.transpose(np.asarray(sd[f"{theirs}.to_v.weight"]))
    qb = np.asarray(sd[f"{theirs}.to_q.bias"])
    kb = np.asarray(sd[f"{theirs}.to_k.bias"])
    vb = np.asarray(sd[f"{theirs}.to_v.bias"])
    return {
        "norm_scale": np.asarray(sd[f"{theirs}.group_norm.weight"]),
        "norm_bias": np.asarray(sd[f"{theirs}.group_norm.bias"]),
        "qkv": {
            "kernel": np.concatenate([q, k, v], axis=1),
            "bias": np.concatenate([qb, kb, vb]),
        },
        "proj_out": {
            "kernel": np.transpose(np.asarray(sd[f"{theirs}.to_out.0.weight"])),
            "bias": np.asarray(sd[f"{theirs}.to_out.0.bias"]),
        },
    }


def export_unet2d(params: PyTree, cfg: UNet2DConfig) -> Dict[str, np.ndarray]:
    p = params["params"] if "params" in params else params
    out: Dict[str, np.ndarray] = {}
    for ours, theirs, kind in _unet2d_plan(cfg):
        if kind == "attn":
            _export_attn(_get(p, ours), theirs, out)
        else:
            out[theirs] = _export_leaf(np.asarray(_get(p, ours)), kind)
    return out


def import_unet2d(sd: Dict[str, np.ndarray], cfg: UNet2DConfig) -> PyTree:
    tree: Dict[str, Any] = {}
    for ours, theirs, kind in _unet2d_plan(cfg):
        if kind == "attn":
            _set(tree, ours, _import_attn(sd, theirs))
        else:
            _set(tree, ours, _import_leaf(np.asarray(sd[theirs]), kind))
    return {"params": tree}


# ---------------------------------------------------------------------------
# SDUNet ↔ UNet2DConditionModel
# ---------------------------------------------------------------------------


def _transformer_pairs(ours: str, theirs: str, use_linear: bool):
    pk = "dense" if use_linear else "conv"
    proj_in = _dense_pairs(f"{ours}/proj_in", f"{theirs}.proj_in") if use_linear \
        else _conv_pairs(f"{ours}/proj_in", f"{theirs}.proj_in")
    proj_out = _dense_pairs(f"{ours}/proj_out", f"{theirs}.proj_out") if use_linear \
        else _conv_pairs(f"{ours}/proj_out", f"{theirs}.proj_out")
    tb_o, tb_t = f"{ours}/block_0", f"{theirs}.transformer_blocks.0"
    pairs = []
    pairs += _norm_pairs(f"{ours}/norm", f"{theirs}.norm")
    pairs += proj_in
    for n in ("norm1", "norm2", "norm3"):
        pairs += [
            (f"{tb_o}/{n}/scale", f"{tb_t}.{n}.weight", "none"),
            (f"{tb_o}/{n}/bias", f"{tb_t}.{n}.bias", "none"),
        ]
    for attn in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v"):
            pairs += _dense_pairs(
                f"{tb_o}/{attn}/{proj}", f"{tb_t}.{attn}.{proj}", bias=False
            )
        pairs += _dense_pairs(f"{tb_o}/{attn}/to_out", f"{tb_t}.{attn}.to_out.0")
    pairs += _dense_pairs(f"{tb_o}/ff/proj_in", f"{tb_t}.ff.net.0.proj")
    pairs += _dense_pairs(f"{tb_o}/ff/proj_out", f"{tb_t}.ff.net.2")
    pairs += proj_out
    return pairs


def _sd_unet_plan(cfg: SDUNetConfig) -> list:
    plan = []
    plan += _conv_pairs("conv_in", "conv_in")
    plan += _dense_pairs("time_embedding/linear_1", "time_embedding.linear_1")
    plan += _dense_pairs("time_embedding/linear_2", "time_embedding.linear_2")
    chans = cfg.block_out_channels
    prev = chans[0]
    for i, (btype, c_out) in enumerate(zip(cfg.down_block_types, chans)):
        for j in range(cfg.layers_per_block):
            c_in = prev if j == 0 else c_out
            plan += _resnet_pairs(
                f"down_{i}_res_{j}", f"down_blocks.{i}.resnets.{j}", c_in != c_out
            )
            if btype == "CrossAttnDownBlock2D":
                plan += _transformer_pairs(
                    f"down_{i}_attn_{j}", f"down_blocks.{i}.attentions.{j}",
                    cfg.use_linear_projection,
                )
        if i < len(chans) - 1:
            plan += _conv_pairs(
                f"down_{i}_downsample/conv", f"down_blocks.{i}.downsamplers.0.conv"
            )
        prev = c_out
    plan += _resnet_pairs("mid_res_0", "mid_block.resnets.0", False)
    plan += _transformer_pairs(
        "mid_attn", "mid_block.attentions.0", cfg.use_linear_projection
    )
    plan += _resnet_pairs("mid_res_1", "mid_block.resnets.1", False)
    rev = tuple(reversed(chans))
    for i, (btype, c_out) in enumerate(zip(cfg.up_block_types, rev)):
        for j in range(cfg.layers_per_block + 1):
            plan += _resnet_pairs(f"up_{i}_res_{j}", f"up_blocks.{i}.resnets.{j}", True)
            if btype == "CrossAttnUpBlock2D":
                plan += _transformer_pairs(
                    f"up_{i}_attn_{j}", f"up_blocks.{i}.attentions.{j}",
                    cfg.use_linear_projection,
                )
        if i < len(rev) - 1:
            plan += _conv_pairs(
                f"up_{i}_upsample/conv", f"up_blocks.{i}.upsamplers.0.conv"
            )
    plan += _norm_pairs("norm_out", "conv_norm_out")
    plan += _conv_pairs("conv_out", "conv_out")
    return plan


def export_sd_unet(params: PyTree, cfg: SDUNetConfig) -> Dict[str, np.ndarray]:
    p = params["params"] if "params" in params else params
    return {
        theirs: _export_leaf(np.asarray(_get(p, ours)), kind)
        for ours, theirs, kind in _sd_unet_plan(cfg)
    }


def import_sd_unet(sd: Dict[str, np.ndarray], cfg: SDUNetConfig) -> PyTree:
    tree: Dict[str, Any] = {}
    for ours, theirs, kind in _sd_unet_plan(cfg):
        _set(tree, ours, _import_leaf(np.asarray(sd[theirs]), kind))
    return {"params": tree}


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------


def _vae_attn_pairs(ours: str, theirs: str):
    pairs = []
    pairs += _norm_pairs(f"{ours}/norm", f"{theirs}.group_norm")
    for proj in ("to_q", "to_k", "to_v"):
        pairs += _dense_pairs(f"{ours}/{proj}", f"{theirs}.{proj}")
    pairs += _dense_pairs(f"{ours}/to_out", f"{theirs}.to_out.0")
    return pairs


def _vae_plan(cfg: AutoencoderKLConfig) -> list:
    plan = []
    chans = cfg.block_out_channels
    # encoder
    plan += _conv_pairs("encoder/conv_in", "encoder.conv_in")
    prev = chans[0]
    for i, c_out in enumerate(chans):
        for j in range(cfg.layers_per_block):
            c_in = prev if j == 0 else c_out
            plan += _vae_resnet_pairs(
                f"encoder/down_{i}_res_{j}",
                f"encoder.down_blocks.{i}.resnets.{j}",
                c_in != c_out,
            )
        if i < len(chans) - 1:
            plan += _conv_pairs(
                f"encoder/down_{i}_downsample",
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
            )
        prev = c_out
    plan += _vae_resnet_pairs("encoder/mid_res_0", "encoder.mid_block.resnets.0", False)
    plan += _vae_attn_pairs("encoder/mid_attn", "encoder.mid_block.attentions.0")
    plan += _vae_resnet_pairs("encoder/mid_res_1", "encoder.mid_block.resnets.1", False)
    plan += _norm_pairs("encoder/norm_out", "encoder.conv_norm_out")
    plan += _conv_pairs("encoder/conv_out", "encoder.conv_out")
    plan += _conv_pairs("quant_conv", "quant_conv")
    # decoder
    plan += _conv_pairs("post_quant_conv", "post_quant_conv")
    plan += _conv_pairs("decoder/conv_in", "decoder.conv_in")
    rev = tuple(reversed(chans))
    plan += _vae_resnet_pairs("decoder/mid_res_0", "decoder.mid_block.resnets.0", False)
    plan += _vae_attn_pairs("decoder/mid_attn", "decoder.mid_block.attentions.0")
    plan += _vae_resnet_pairs("decoder/mid_res_1", "decoder.mid_block.resnets.1", False)
    prev = rev[0]
    for i, c_out in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            c_in = prev if j == 0 else c_out
            plan += _vae_resnet_pairs(
                f"decoder/up_{i}_res_{j}",
                f"decoder.up_blocks.{i}.resnets.{j}",
                c_in != c_out,
            )
        if i < len(rev) - 1:
            plan += _conv_pairs(
                f"decoder/up_{i}_upsample",
                f"decoder.up_blocks.{i}.upsamplers.0.conv",
            )
        prev = c_out
    plan += _norm_pairs("decoder/norm_out", "decoder.conv_norm_out")
    plan += _conv_pairs("decoder/conv_out", "decoder.conv_out")
    return plan


def export_vae(params: PyTree, cfg: AutoencoderKLConfig) -> Dict[str, np.ndarray]:
    p = params["params"] if "params" in params else params
    return {
        theirs: _export_leaf(np.asarray(_get(p, ours)), kind)
        for ours, theirs, kind in _vae_plan(cfg)
    }


def import_vae(sd: Dict[str, np.ndarray], cfg: AutoencoderKLConfig) -> PyTree:
    tree: Dict[str, Any] = {}
    for ours, theirs, kind in _vae_plan(cfg):
        _set(tree, ours, _import_leaf(np.asarray(sd[theirs]), kind))
    return {"params": tree}


# ---------------------------------------------------------------------------
# File loading
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}
