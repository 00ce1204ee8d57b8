"""CondUNet2D shape/conditioning/gradient tests (reference parity targets:
cond_unet_2d.py forward contract and the four denoiser configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.models import CondUNet2D, UNet2DConfig
from phendiff_tpu.models import config as C

TINY = UNet2DConfig(
    sample_size=16,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    attention_head_dim=4,
    num_class_embeds=2,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = CondUNet2D(TINY)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(
        jax.random.key(0), x, jnp.array([0, 1]), class_labels=jnp.array([0, 1])
    )
    return model, params


def test_forward_shape(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    out = model.apply(params, x, jnp.array([10, 500]), class_labels=jnp.array([0, 1]))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_scalar_timestep_broadcast(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
    a = model.apply(params, x, jnp.array(10), class_labels=jnp.array([0, 0]))
    b = model.apply(params, x, jnp.array([10, 10]), class_labels=jnp.array([0, 0]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_class_conditioning_changes_output(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 3))
    t = jnp.array([100])
    a = model.apply(params, x, t, class_labels=jnp.array([0]))
    b = model.apply(params, x, t, class_labels=jnp.array([1]))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_precomputed_class_emb_matches_labels(tiny_model):
    """The CFG contract: passing the embedding table row as class_emb must
    equal passing the integer label (cond_unet_2d.py:297-309 semantics)."""
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(4), (1, 16, 16, 3))
    t = jnp.array([100])
    table = params["params"]["class_embedding"]["embedding"]
    a = model.apply(params, x, t, class_labels=jnp.array([1]))
    b = model.apply(params, x, t, class_emb=table[1][None])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_zeros_class_emb_is_uncond_pass(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(5), (1, 16, 16, 3))
    t = jnp.array([100])
    zeros = jnp.zeros((1, TINY.time_embed_dim))
    out = model.apply(params, x, t, class_emb=zeros)
    assert np.isfinite(np.asarray(out)).all()


def test_missing_conditioning_raises(tiny_model):
    model, params = tiny_model
    x = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError):
        model.apply(params, x, jnp.array([0]))


def test_grad_flows(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(6), (2, 16, 16, 3))

    def loss(p):
        out = model.apply(p, x, jnp.array([5, 7]), class_labels=jnp.array([0, 1]))
        return jnp.mean((out - x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # class embedding must receive gradient (both classes used)
    cg = g["params"]["class_embedding"]["embedding"]
    assert np.abs(np.asarray(cg)).sum() > 0


def test_bf16_compute(tiny_model):
    _, params = tiny_model
    model = CondUNet2D(TINY, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(7), (1, 16, 16, 3))
    out = model.apply(params, x, jnp.array([3]), class_labels=jnp.array([0]))
    assert out.dtype == x.dtype  # cast back at boundary
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


@pytest.mark.parametrize("preset", list(C.PRESETS))
def test_reference_presets_structurally_valid(preset):
    """All four reference denoiser configs build and run.  Channel widths are
    divided by 8 (structure, block types, and depth preserved) so the test
    fits a 1-core CPU; the full-width configs are exercised on TPU by
    bench.py."""
    cfg = C.PRESETS[preset]()
    narrow = tuple(max(c // 8, 8) for c in cfg.block_out_channels)
    cfg = cfg.replace(block_out_channels=narrow, norm_num_groups=4,
                      attention_head_dim=4 if cfg.attention_head_dim else None)
    model = CondUNet2D(cfg)
    res = 2 ** (len(narrow) + 1)  # enough for all downsamples
    x = jnp.zeros((1, res, res, 3))
    labels = jnp.array([0]) if cfg.num_class_embeds else None
    params = model.init(jax.random.key(0), x, jnp.array([0]), class_labels=labels)
    out = model.apply(params, x, jnp.array([0]), class_labels=labels)
    assert out.shape == x.shape


def test_config_json_roundtrip():
    cfg = C.super_small()
    d = cfg.to_json_dict()
    cfg2 = UNet2DConfig.from_json(d)
    assert cfg == cfg2


def test_param_count_scales_with_config():
    small = CondUNet2D(TINY)
    x = jnp.zeros((1, 16, 16, 3))
    p1 = small.init(jax.random.key(0), x, jnp.array([0]), class_labels=jnp.array([0]))
    n1 = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p1))
    bigger = CondUNet2D(TINY.replace(block_out_channels=(16, 32)))
    p2 = bigger.init(jax.random.key(0), x, jnp.array([0]), class_labels=jnp.array([0]))
    n2 = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p2))
    assert n2 > 2 * n1
