"""SD img2img pipeline tests (reference parity:
custom_pipeline_stable_diffusion_img2img.py behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
from phendiff_tpu.models.sd_unet import SDUNetConfig
from phendiff_tpu.pipelines.conditional_ddim import truncate_pairs_by_strength
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
SCHED = SchedulerConfig(
    num_train_timesteps=50, timestep_spacing="leading", clip_sample=False,
    set_alpha_to_one=False, steps_offset=1,
)


@pytest.fixture(scope="module")
def pipe():
    return SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )


def test_generate_from_noise(pipe):
    out = pipe.generate(
        jnp.array([0, 1]), jax.random.key(0), num_inference_steps=3
    )
    # VAE has 3 downsamples → images are 8x latent resolution
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_generate_latent_output(pipe):
    lat = pipe.generate(
        jnp.array([0]), jax.random.key(1), num_inference_steps=2,
        output_type="latent",
    )
    assert lat.shape == (1, 4, 4, 4)
    img, lat2 = pipe.generate(
        jnp.array([0]), jax.random.key(1), num_inference_steps=2,
        output_type="image+latent",
    )
    np.testing.assert_allclose(np.asarray(lat), np.asarray(lat2), atol=1e-6)
    assert img.shape == (1, 32, 32, 3)


def test_img2img_with_strength(pipe):
    img = jax.random.normal(jax.random.key(2), (1, 32, 32, 3)) * 0.2
    out = pipe.generate(
        jnp.array([1]), jax.random.key(3), image=img, strength=0.5,
        add_forward_noise=True, num_inference_steps=4,
    )
    assert out.shape == img.shape


def test_cfg_batched(pipe):
    a = pipe.generate(
        jnp.array([0]), jax.random.key(4), num_inference_steps=2,
        guidance_scale=0.0,
    )
    b = pipe.generate(
        jnp.array([0]), jax.random.key(4), num_inference_steps=2,
        guidance_scale=3.0,
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_latent_inversion_roundtrip(pipe):
    lat = pipe.generate(
        jnp.array([0]), jax.random.key(5), num_inference_steps=25,
        output_type="latent",
    )
    inv = pipe.invert(lat, jnp.array([0]), num_inference_steps=25)
    again = pipe.generate(
        jnp.array([0]), jax.random.key(6), latents=inv,
        num_inference_steps=25, output_type="latent",
    )
    err = float(jnp.mean((again - lat) ** 2))
    sig = float(jnp.mean(lat**2))
    assert err < 0.1 * max(sig, 1e-3), (err, sig)


def test_encode_class_shape(pipe):
    seq = pipe.encode_class(jnp.array([0, 1]))
    assert seq.shape == (2, 77, 16)
    assert not np.allclose(np.asarray(seq[0, 0]), np.asarray(seq[1, 0]))
    np.testing.assert_allclose(np.asarray(seq[:, 1:]), 0.0)


def test_strength_truncation_semantics():
    import numpy as np

    ts = np.arange(10)[::-1]
    tp = np.concatenate([ts[1:], [-1]])
    t2, p2 = truncate_pairs_by_strength(ts, tp, 0.3)
    assert len(t2) == 3
    assert t2[-1] == ts[-1] and p2[-1] == -1  # keeps the low-noise tail
    with pytest.raises(ValueError):
        truncate_pairs_by_strength(ts, tp, 0.0)


def test_save_load_roundtrip(pipe, tmp_path):
    d = str(tmp_path / "sd_pipe")
    pipe.save_pretrained(d)
    loaded = SDImg2ImgPipeline.from_pretrained(d)
    assert loaded.unet_config == pipe.unet_config
    assert loaded.vae_config == pipe.vae_config
    assert loaded.num_classes == 2
    a = pipe.generate(jnp.array([1]), jax.random.key(7), num_inference_steps=2)
    b = loaded.generate(jnp.array([1]), jax.random.key(7), num_inference_steps=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
