"""SD model family tests: VAE, SD UNet, weight conversion round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.models import hf_import
from phendiff_tpu.models.autoencoder_kl import (
    AutoencoderKL,
    AutoencoderKLConfig,
    decode_from_latents,
    encode_to_latents,
)
from phendiff_tpu.models.config import UNet2DConfig
from phendiff_tpu.models.embeddings import pad_to_clip_sequence
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.models.unet2d import CondUNet2D

TINY_VAE = AutoencoderKLConfig(
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    latent_channels=4, sample_size=32,
)
TINY_SD = SDUNetConfig(
    sample_size=8,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=24,
    attention_head_dim=(2, 4),
    norm_num_groups=4,
)


@pytest.fixture(scope="module")
def vae():
    model = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    return model, variables


@pytest.fixture(scope="module")
def sd_unet():
    model = SDUNet(TINY_SD)
    x = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 77, 24))
    params = model.init(jax.random.key(0), x, jnp.array([0, 1]), ctx)
    return model, params


def test_vae_encode_decode_shapes(vae):
    model, variables = vae
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3)) * 0.5
    mean, logvar = model.apply(variables, x, method=AutoencoderKL.encode)
    assert mean.shape == (2, 16, 16, 4)  # /2 per downsample (one here)
    assert logvar.shape == mean.shape
    recon = model.apply(variables, mean, method=AutoencoderKL.decode)
    assert recon.shape == x.shape
    assert np.isfinite(np.asarray(recon)).all()


def test_vae_latent_helpers_scaling(vae):
    model, variables = vae
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 3)) * 0.5
    z = encode_to_latents(model, variables, x)  # deterministic (mode)
    mean, _ = model.apply(variables, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(mean) * TINY_VAE.scaling_factor, atol=1e-6
    )
    out = decode_from_latents(model, variables, z)
    assert out.shape == x.shape


def test_vae_sampling_stochastic(vae):
    model, variables = vae
    x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3))
    z1 = encode_to_latents(model, variables, x, rng=jax.random.key(4))
    z2 = encode_to_latents(model, variables, x, rng=jax.random.key(5))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_sd_unet_forward(sd_unet):
    model, params = sd_unet
    x = jax.random.normal(jax.random.key(6), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(7), (2, 77, 24))
    out = model.apply(params, x, jnp.array([10, 500]), ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sd_unet_conditioning_matters(sd_unet):
    model, params = sd_unet
    x = jax.random.normal(jax.random.key(8), (1, 8, 8, 4))
    emb = jax.random.normal(jax.random.key(9), (1, 24))
    c1 = pad_to_clip_sequence(emb)
    c2 = pad_to_clip_sequence(emb * -1.0)
    a = model.apply(params, x, jnp.array([100]), c1)
    b = model.apply(params, x, jnp.array([100]), c2)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_pad_to_clip_sequence_shape():
    emb = jnp.ones((3, 24))
    seq = pad_to_clip_sequence(emb)
    assert seq.shape == (3, 77, 24)
    np.testing.assert_allclose(np.asarray(seq[:, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(seq[:, 1:]), 0.0)


def test_sd_config_json_roundtrip():
    d = TINY_SD.to_json_dict()
    cfg = SDUNetConfig.from_json(d)
    assert cfg == TINY_SD
    v = TINY_VAE.to_json_dict()
    assert AutoencoderKLConfig.from_json(v) == TINY_VAE


def _trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert len(fa[0]) == len(fb[0])
    pa = {jax.tree_util.keystr(k): v for k, v in fa[0]}
    pb = {jax.tree_util.keystr(k): v for k, v in fb[0]}
    assert pa.keys() == pb.keys()
    for k in pa:
        np.testing.assert_allclose(
            np.asarray(pa[k]), np.asarray(pb[k]), atol=0, err_msg=k
        )


def test_unet2d_weight_conversion_roundtrip():
    cfg = UNet2DConfig(
        sample_size=16, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4, attention_head_dim=4,
        num_class_embeds=2,
    )
    model = CondUNet2D(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x, jnp.array([0]),
                        class_labels=jnp.array([0]))
    sd = hf_import.export_unet2d(params, cfg)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    back = hf_import.import_unet2d(sd, cfg)
    _trees_equal(params["params"], back["params"])
    # the converted tree actually runs
    out = model.apply(back, x, jnp.array([0]), class_labels=jnp.array([0]))
    ref = model.apply(params, x, jnp.array([0]), class_labels=jnp.array([0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_sd_unet_weight_conversion_roundtrip(sd_unet):
    model, params = sd_unet
    sd = hf_import.export_sd_unet(params, TINY_SD)
    back = hf_import.import_sd_unet(sd, TINY_SD)
    _trees_equal(params["params"], back["params"])


def test_vae_weight_conversion_roundtrip(vae):
    model, variables = vae
    sd = hf_import.export_vae(variables, TINY_VAE)
    back = hf_import.import_vae(sd, TINY_VAE)
    _trees_equal(variables["params"], back["params"])
    x = jnp.ones((1, 32, 32, 3)) * 0.1
    a, _, _ = model.apply(variables, x)
    b, _, _ = model.apply(back, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
