"""Inference engine tests: fixed-shape padding, warmup, op correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.models import UNet2DConfig
from phendiff_tpu.pipelines import ConditionalDDIMPipeline
from phendiff_tpu.serving import EngineConfig, InferenceEngine

TINY = UNet2DConfig(
    sample_size=8,
    block_out_channels=(8, 8),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    num_class_embeds=2,
)
SCHED = SchedulerConfig(num_train_timesteps=20, clip_sample=False)


@pytest.fixture(scope="module")
def engine():
    pipe = ConditionalDDIMPipeline.init_random(TINY, SCHED, seed=0)
    eng = InferenceEngine(
        pipe, EngineConfig(max_batch=8, num_inference_steps=4)
    )
    times = eng.warmup()
    assert set(times) == {"generate", "transfer", "invert"}
    return eng


def test_generate_partial_batch(engine):
    out = engine.generate(np.array([0, 1, 0]), seed=1)
    assert out.shape == (3, 8, 8, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_generate_padding_invariance(engine):
    """Results for a request must not depend on the padding rows."""
    a = engine.generate(np.array([0, 1]), seed=2)
    b = engine.generate(np.array([0, 1, 1, 1]), seed=2)
    np.testing.assert_allclose(a, b[:2], atol=1e-5)


def test_transfer_binary_flip_default(engine):
    imgs = engine.generate(np.array([0, 0]), seed=3)
    out = engine.transfer(imgs, np.array([0, 0]))
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()


def test_invert_shape(engine):
    imgs = engine.generate(np.array([1]), seed=4)
    lat = engine.invert(imgs, np.array([1]))
    assert lat.shape == (1, 8, 8, 3)


def test_batch_too_large_raises(engine):
    with pytest.raises(ValueError):
        engine.generate(np.zeros(9, dtype=np.int32))


def test_stats_accumulate(engine):
    s = engine.stats()
    assert s["requests"] >= 4 and s["images"] >= 7
    assert s.get("images_per_sec", 0) > 0
