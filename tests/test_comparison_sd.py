"""Comparison engine with an SD (latent) pipeline — exercises the LDM
preprocess/decode branch of every transfer method (reference
``_LDM_preprocess`` / ``_decode_to_images``, utils_Img2Img.py:803-847)."""

import dataclasses

import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.experiments.comparison import (
    ComparisonConfig,
    ComparisonExperiment,
    MethodParams,
)
from phendiff_tpu.metrics.fidelity import MetricsConfig
from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
from phendiff_tpu.models.sd_unet import SDUNetConfig
from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline

TINY_SD = SDUNetConfig(
    sample_size=4,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=(2, 4),
    norm_num_groups=4,
)
TINY_VAE = AutoencoderKLConfig(
    block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4,
    latent_channels=4, sample_size=32,
)


@pytest.mark.parametrize(
    "method",
    [
        "ddib",
        "classifier_free_guidance_forward_start",
        "linear_interp_custom_guidance_inverted_start",
    ],
)
def test_sd_transfer_methods_through_engine(
    tiny_image_root, tmp_path, method
):
    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE,
        SchedulerConfig(num_train_timesteps=20, clip_sample=False),
        num_classes=2, class_embedding_dim=16, seed=0,
    )
    pipe_dir = tmp_path / "sd_pipe"
    pipe.save_pretrained(str(pipe_dir))

    cfg = ComparisonConfig(
        output_dir=str(tmp_path / "out"),
        pipelines={"sd": str(pipe_dir)},
        dataset_train=str(tiny_image_root),
        definition=(32, 32),
        methods=(method,),
        method_params={method: MethodParams(batch_size=8)},
        num_inference_steps=3,
        metrics=MetricsConfig(fid=False, isc=False, kid=False),
        debug=True,
    )
    exp = ComparisonExperiment(cfg)
    exp.run_transfers()
    outs = list((tmp_path / "out" / method / "sd" / "train").rglob("*_to_*.png"))
    assert outs, f"no outputs for {method}"
    from PIL import Image

    with Image.open(outs[0]) as im:
        assert im.size == (32, 32)
