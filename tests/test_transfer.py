"""Class-transfer method tests (reference parity: utils_Img2Img.py engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.models import UNet2DConfig
from phendiff_tpu.pipelines import ConditionalDDIMPipeline
from phendiff_tpu.pipelines import transfer as T

TINY_UNET = UNet2DConfig(
    sample_size=8,
    block_out_channels=(8, 8),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    num_class_embeds=2,
)
SCHED = SchedulerConfig(num_train_timesteps=100, timestep_spacing="trailing",
                        clip_sample=False)


@pytest.fixture(scope="module")
def setup():
    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=1)
    denoiser = pipe.denoiser_fn()
    schedule = pipe.schedule
    emb = lambda labels: pipe.class_embeddings(jnp.asarray(labels))
    images = pipe.generate(
        jnp.array([0, 1]), jax.random.key(0), num_inference_steps=20
    )
    return denoiser, schedule, emb, images


def test_ddib_shapes_and_changes_image(setup):
    denoiser, schedule, emb, images = setup
    src, tgt = jnp.array([0, 1]), jnp.array([1, 0])  # binary flip: 1 - orig
    out = T.ddib(
        denoiser, schedule, images, emb(src), emb(tgt), num_inference_steps=20
    )
    assert out.shape == images.shape
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(images), atol=1e-3)


def test_inverted_regeneration_reconstructs(setup):
    denoiser, schedule, emb, images = setup
    labels = jnp.array([0, 1])
    recon = T.inverted_regeneration(
        denoiser, schedule, images, emb(labels), num_inference_steps=50
    )
    err = float(jnp.mean((recon - images) ** 2))
    sig = float(jnp.mean(images**2))
    assert err < 0.05 * max(sig, 1e-3), (err, sig)


def test_ddib_reduces_to_regeneration_when_same_class(setup):
    denoiser, schedule, emb, images = setup
    labels = jnp.array([0, 1])
    a = T.ddib(
        denoiser, schedule, images, emb(labels), emb(labels), num_inference_steps=10
    )
    b = T.inverted_regeneration(
        denoiser, schedule, images, emb(labels), num_inference_steps=10
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cfg_forward_start(setup):
    denoiser, schedule, emb, images = setup
    tgt = jnp.array([1, 0])
    out = T.cfg_forward_start(
        denoiser, schedule, images, emb(tgt), jax.random.key(3),
        guidance_scale=2.5, frac_diffusion_skipped=0.5, num_inference_steps=10,
    )
    assert out.shape == images.shape
    assert np.isfinite(np.asarray(out)).all()
    # partial noising keeps overall structure closer than full ddib transfer
    assert float(jnp.mean((out - images) ** 2)) < 4.0


def test_guided_inverted_start_runs_and_guides(setup):
    denoiser, schedule, emb, images = setup
    src, tgt = jnp.array([0, 1]), jnp.array([1, 0])
    guided = T.guided_inverted_start(
        denoiser, schedule, images, emb(src), emb(tgt),
        guidance_loss_scale=1e-3, num_inference_steps=10,
    )
    unguided = T.guided_inverted_start(
        denoiser, schedule, images, emb(src), emb(tgt),
        guidance_loss_scale=0.0, num_inference_steps=10,
    )
    assert np.isfinite(np.asarray(guided)).all()
    assert not np.allclose(np.asarray(guided), np.asarray(unguided))


def test_guided_gradient_batch_independent(setup):
    """Per-sample gradients must not scale with batch size (the reference
    sums per-sample losses; utils_Img2Img.py:745)."""
    denoiser, schedule, emb, images = setup
    tgt1 = emb(jnp.array([1]))
    tgt2 = emb(jnp.array([1, 0]))
    single = T.custom_guided_generation(
        denoiser, schedule, images[:1], tgt1,
        guidance_loss_scale=1e-2, num_inference_steps=5,
    )
    batched = T.custom_guided_generation(
        denoiser, schedule, images, tgt2,
        guidance_loss_scale=1e-2, num_inference_steps=5,
    )
    np.testing.assert_allclose(
        np.asarray(single[0]), np.asarray(batched[0]), atol=1e-5
    )


def test_lp_loss_per_sample():
    a = jnp.zeros((2, 3, 3, 1))
    b = jnp.ones((2, 3, 3, 1)).at[1].multiply(2.0)
    out = np.asarray(T.lp_loss(a, b, p=2.0))
    assert out.shape == (2,)
    assert out[0] == pytest.approx(3.0)  # sqrt(9 * 1)
    assert out[1] == pytest.approx(6.0)


def test_check_gaussianity_on_gaussian(setup):
    x = jax.random.normal(jax.random.key(10), (4, 8, 8, 3))
    stats = T.check_gaussianity(x)
    assert abs(float(stats["mean"])) < 0.1
    assert abs(float(stats["std"]) - 1.0) < 0.1
    assert abs(float(stats["skewness"])) < 0.3
    assert abs(float(stats["excess_kurtosis"])) < 0.5


def test_ddib_stepwise_matches_scan():
    """Host-driven DDIB (for segmented full-width denoisers) must equal the
    single-scan ddib exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phendiff_tpu.core import SchedulerConfig, make_schedule
    from phendiff_tpu.models import CondUNet2D, UNet2DConfig
    from phendiff_tpu.pipelines import transfer as T

    cfg = UNet2DConfig(
        sample_size=8, block_out_channels=(8, 8),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4, num_class_embeds=2,
    )
    model = CondUNet2D(cfg)
    x0 = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.key(0), x0, jnp.array([0]),
                        class_labels=jnp.array([0]))
    den = lambda x, t, e: model.apply(params, x, t, class_emb=e)
    sched = make_schedule(SchedulerConfig(
        num_train_timesteps=20, clip_sample=False,
        timestep_spacing="trailing"))
    table = params["params"]["class_embedding"]["embedding"]
    imgs = jax.random.normal(jax.random.key(1), (2, 8, 8, 3)) * 0.3
    src = jnp.tile(table[0][None], (2, 1))
    tgt = jnp.tile(table[1][None], (2, 1))

    a = T.ddib(den, sched, imgs, src, tgt, num_inference_steps=5)
    b = T.ddib_stepwise(den, sched, imgs, src, tgt, num_inference_steps=5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-6)
