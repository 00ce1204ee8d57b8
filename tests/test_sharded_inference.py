"""Sharded inference on the 8-device CPU mesh: transfers and sampling ride
the data axis and match single-device results (multi-chip path validation
beyond the dryrun)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.models import UNet2DConfig
from phendiff_tpu.parallel import data_sharding, make_mesh, shard_batch
from phendiff_tpu.pipelines import ConditionalDDIMPipeline
from phendiff_tpu.pipelines import transfer as T

TINY = UNet2DConfig(
    sample_size=8,
    block_out_channels=(8, 8),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    num_class_embeds=2,
)


@pytest.fixture(scope="module")
def setup():
    pipe = ConditionalDDIMPipeline.init_random(
        TINY, SchedulerConfig(num_train_timesteps=20, clip_sample=False), seed=0
    )
    mesh = make_mesh()
    return pipe, mesh


def test_sharded_ddib_matches_unsharded(setup):
    pipe, mesh = setup
    images = jax.random.normal(jax.random.key(0), (16, 8, 8, 3)) * 0.5
    src = jnp.tile(jnp.array([0, 1], dtype=jnp.int32), 8)
    tgt = 1 - src

    def run(imgs, s, t):
        return T.ddib(
            pipe.denoiser_fn(), pipe.schedule, imgs,
            pipe.class_embeddings(s), pipe.class_embeddings(t),
            num_inference_steps=5,
        )

    plain = jax.jit(run)(images, src, tgt)
    sharded_in = shard_batch(mesh, (images, src, tgt))
    sharded = jax.jit(run)(*sharded_in)
    # output keeps the data sharding
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(sharded), atol=1e-5
    )


def test_sharded_generation_matches_unsharded(setup):
    pipe, mesh = setup
    labels = jnp.tile(jnp.array([0, 1], dtype=jnp.int32), 4)

    def gen(l):
        return pipe.generate(l, jax.random.key(1), num_inference_steps=4)

    plain = jax.jit(gen)(labels)
    sharded = jax.jit(gen)(shard_batch(mesh, labels))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), atol=1e-5)
