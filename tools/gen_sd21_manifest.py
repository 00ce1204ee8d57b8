"""Generate the stabilityai/stable-diffusion-2-1 UNet + VAE state-dict
key→shape manifest from first principles.

INDEPENDENT of ``phendiff_tpu.models.hf_import``: this script encodes the
*public* diffusers state-dict naming rules for ``UNet2DConditionModel`` /
``AutoencoderKL`` (the checkpoint layout the reference loads in
``src/utils_models.py:67-122``) directly from the architecture definition,
so the vendored fixture cross-checks the exporter rather than echoing it.

SD-2.1 UNet config (unet/config.json of the checkpoint):
  block_out_channels (320, 640, 1280, 1280), layers_per_block 2,
  cross_attention_dim 1024, attention_head_dim (5, 10, 20, 20),
  use_linear_projection true, in/out channels 4.
SD VAE config: block_out_channels (128, 256, 512, 512), layers_per_block 2,
  latent_channels 4, double_z (conv_out emits mean‖logvar).

Run: python tools/gen_sd21_manifest.py > tests/fixtures/sd21_manifest.json
"""

import json

UNET_C = (320, 640, 1280, 1280)
LAYERS = 2
CTX = 1024
HEADS = (5, 10, 20, 20)
TEMB = UNET_C[0] * 4  # 1280

VAE_C = (128, 256, 512, 512)
VAE_LAYERS = 2
LATENT = 4


def resnet(man, p, cin, cout, temb=TEMB):
    man[f"{p}.norm1.weight"] = [cin]
    man[f"{p}.norm1.bias"] = [cin]
    man[f"{p}.conv1.weight"] = [cout, cin, 3, 3]
    man[f"{p}.conv1.bias"] = [cout]
    if temb:
        man[f"{p}.time_emb_proj.weight"] = [cout, temb]
        man[f"{p}.time_emb_proj.bias"] = [cout]
    man[f"{p}.norm2.weight"] = [cout]
    man[f"{p}.norm2.bias"] = [cout]
    man[f"{p}.conv2.weight"] = [cout, cout, 3, 3]
    man[f"{p}.conv2.bias"] = [cout]
    if cin != cout:
        man[f"{p}.conv_shortcut.weight"] = [cout, cin, 1, 1]
        man[f"{p}.conv_shortcut.bias"] = [cout]


def transformer(man, p, c):
    """Transformer2DModel, depth 1, linear projections (SD-2.1)."""
    man[f"{p}.norm.weight"] = [c]
    man[f"{p}.norm.bias"] = [c]
    man[f"{p}.proj_in.weight"] = [c, c]
    man[f"{p}.proj_in.bias"] = [c]
    tb = f"{p}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        man[f"{tb}.{n}.weight"] = [c]
        man[f"{tb}.{n}.bias"] = [c]
    # self-attention: q/k/v from the hidden states, no biases
    for n in ("to_q", "to_k", "to_v"):
        man[f"{tb}.attn1.{n}.weight"] = [c, c]
    man[f"{tb}.attn1.to_out.0.weight"] = [c, c]
    man[f"{tb}.attn1.to_out.0.bias"] = [c]
    # cross-attention: k/v from the 1024-dim conditioning sequence
    man[f"{tb}.attn2.to_q.weight"] = [c, c]
    man[f"{tb}.attn2.to_k.weight"] = [c, CTX]
    man[f"{tb}.attn2.to_v.weight"] = [c, CTX]
    man[f"{tb}.attn2.to_out.0.weight"] = [c, c]
    man[f"{tb}.attn2.to_out.0.bias"] = [c]
    # GEGLU feed-forward: net.0 emits value‖gate (2 × 4c), net.2 projects back
    man[f"{tb}.ff.net.0.proj.weight"] = [8 * c, c]
    man[f"{tb}.ff.net.0.proj.bias"] = [8 * c]
    man[f"{tb}.ff.net.2.weight"] = [c, 4 * c]
    man[f"{tb}.ff.net.2.bias"] = [c]
    man[f"{p}.proj_out.weight"] = [c, c]
    man[f"{p}.proj_out.bias"] = [c]


def unet_manifest():
    man = {}
    man["conv_in.weight"] = [UNET_C[0], 4, 3, 3]
    man["conv_in.bias"] = [UNET_C[0]]
    man["time_embedding.linear_1.weight"] = [TEMB, UNET_C[0]]
    man["time_embedding.linear_1.bias"] = [TEMB]
    man["time_embedding.linear_2.weight"] = [TEMB, TEMB]
    man["time_embedding.linear_2.bias"] = [TEMB]

    # down path: blocks 0-2 CrossAttnDownBlock2D, block 3 DownBlock2D
    out_ch = UNET_C[0]
    for i, c in enumerate(UNET_C):
        in_ch, out_ch = out_ch, c
        cross = i < 3
        for j in range(LAYERS):
            resnet(man, f"down_blocks.{i}.resnets.{j}",
                   in_ch if j == 0 else out_ch, out_ch)
            if cross:
                transformer(man, f"down_blocks.{i}.attentions.{j}", out_ch)
        if i < len(UNET_C) - 1:
            man[f"down_blocks.{i}.downsamplers.0.conv.weight"] = [out_ch, out_ch, 3, 3]
            man[f"down_blocks.{i}.downsamplers.0.conv.bias"] = [out_ch]

    # mid
    resnet(man, "mid_block.resnets.0", UNET_C[-1], UNET_C[-1])
    transformer(man, "mid_block.attentions.0", UNET_C[-1])
    resnet(man, "mid_block.resnets.1", UNET_C[-1], UNET_C[-1])

    # up path: block 0 UpBlock2D, blocks 1-3 CrossAttnUpBlock2D.
    # diffusers skip-channel rule (unet_2d_condition.py): with reversed
    # channels rev, up block i has in=rev[min(i+1, 3)], out=rev[i],
    # prev=previous out; resnet j input is
    #   (prev if j==0 else out) + (in if j==last else out).
    rev = tuple(reversed(UNET_C))
    prev = rev[0]
    for i in range(4):
        out_c = rev[i]
        in_c = rev[min(i + 1, 3)]
        cross = i > 0
        for j in range(LAYERS + 1):
            skip = in_c if j == LAYERS else out_c
            res_in = (prev if j == 0 else out_c) + skip
            resnet(man, f"up_blocks.{i}.resnets.{j}", res_in, out_c)
            if cross:
                transformer(man, f"up_blocks.{i}.attentions.{j}", out_c)
        if i < 3:
            man[f"up_blocks.{i}.upsamplers.0.conv.weight"] = [out_c, out_c, 3, 3]
            man[f"up_blocks.{i}.upsamplers.0.conv.bias"] = [out_c]
        prev = out_c

    man["conv_norm_out.weight"] = [UNET_C[0]]
    man["conv_norm_out.bias"] = [UNET_C[0]]
    man["conv_out.weight"] = [4, UNET_C[0], 3, 3]
    man["conv_out.bias"] = [4]
    return man


def vae_attention(man, p, c):
    """AutoencoderKL mid-block Attention (diffusers ≥0.15 naming)."""
    man[f"{p}.group_norm.weight"] = [c]
    man[f"{p}.group_norm.bias"] = [c]
    for n in ("to_q", "to_k", "to_v"):
        man[f"{p}.{n}.weight"] = [c, c]
        man[f"{p}.{n}.bias"] = [c]
    man[f"{p}.to_out.0.weight"] = [c, c]
    man[f"{p}.to_out.0.bias"] = [c]


def vae_manifest():
    man = {}
    man["encoder.conv_in.weight"] = [VAE_C[0], 3, 3, 3]
    man["encoder.conv_in.bias"] = [VAE_C[0]]
    out_ch = VAE_C[0]
    for i, c in enumerate(VAE_C):
        in_ch, out_ch = out_ch, c
        for j in range(VAE_LAYERS):
            resnet(man, f"encoder.down_blocks.{i}.resnets.{j}",
                   in_ch if j == 0 else out_ch, out_ch, temb=None)
        if i < len(VAE_C) - 1:
            man[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = [out_ch, out_ch, 3, 3]
            man[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = [out_ch]
    c = VAE_C[-1]
    resnet(man, "encoder.mid_block.resnets.0", c, c, temb=None)
    vae_attention(man, "encoder.mid_block.attentions.0", c)
    resnet(man, "encoder.mid_block.resnets.1", c, c, temb=None)
    man["encoder.conv_norm_out.weight"] = [c]
    man["encoder.conv_norm_out.bias"] = [c]
    man["encoder.conv_out.weight"] = [2 * LATENT, c, 3, 3]
    man["encoder.conv_out.bias"] = [2 * LATENT]
    man["quant_conv.weight"] = [2 * LATENT, 2 * LATENT, 1, 1]
    man["quant_conv.bias"] = [2 * LATENT]
    man["post_quant_conv.weight"] = [LATENT, LATENT, 1, 1]
    man["post_quant_conv.bias"] = [LATENT]

    man["decoder.conv_in.weight"] = [c, LATENT, 3, 3]
    man["decoder.conv_in.bias"] = [c]
    resnet(man, "decoder.mid_block.resnets.0", c, c, temb=None)
    vae_attention(man, "decoder.mid_block.attentions.0", c)
    resnet(man, "decoder.mid_block.resnets.1", c, c, temb=None)
    rev = tuple(reversed(VAE_C))
    prev = rev[0]
    for i in range(4):
        out_c = rev[i]
        # UpDecoderBlock2D: layers_per_block+1 resnets, NO skip concat
        for j in range(VAE_LAYERS + 1):
            resnet(man, f"decoder.up_blocks.{i}.resnets.{j}",
                   prev if j == 0 else out_c, out_c, temb=None)
        if i < 3:
            man[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = [out_c, out_c, 3, 3]
            man[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = [out_c]
        prev = out_c
    man["decoder.conv_norm_out.weight"] = [rev[-1]]
    man["decoder.conv_norm_out.bias"] = [rev[-1]]
    man["decoder.conv_out.weight"] = [3, rev[-1], 3, 3]
    man["decoder.conv_out.bias"] = [3]
    return man


def main():
    unet = unet_manifest()
    vae = vae_manifest()
    n_unet = sum(
        __import__("math").prod(s) for s in unet.values()
    )
    n_vae = sum(__import__("math").prod(s) for s in vae.values())
    print(json.dumps({
        "_comment": "stabilityai/stable-diffusion-2-1 diffusers state-dict "
                    "key->shape manifest, generated by tools/gen_sd21_manifest.py",
        "unet_param_count": n_unet,
        "vae_param_count": n_vae,
        "unet": unet,
        "vae": vae,
    }, indent=1))


if __name__ == "__main__":
    main()
