"""Pipeline-parallel executor tests (8-device CPU mesh).

The stage programs are the segmented UNet's own (numerics pinned equal to
the monolith in test_sd_segmented.py); these tests pin the *placement and
transfer* logic: per-stage params live on their assigned devices, and the
pipelined forward — with and without microbatching — is exactly the
single-device segmented forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.parallel.pp import PipelinedSDUNet, stage_devices, stage_keys

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


def test_stage_assignment_contiguous():
    keys = stage_keys(TINY_SD)  # stem, down:0, down:1, mid, up:0, up:1, out
    assert keys == ["stem", "down:0", "down:1", "mid", "up:0", "up:1", "out"]
    devs = jax.devices()[:4]
    assign = stage_devices(keys, devs)
    order = [devs.index(assign[k]) for k in keys]
    assert order == sorted(order), "assignment must be monotone (contiguous)"
    assert set(assign.values()) == set(devs), "all devices used"


@pytest.fixture(scope="module")
def pp_setup():
    devices = jax.devices()[:7]  # one device per stage
    pp = PipelinedSDUNet(TINY_SD, devices=devices)
    x0 = jnp.zeros((2, 8, 8, 4))
    ctx0 = jnp.zeros((2, 77, 24))
    params = SDUNet(TINY_SD).init(jax.random.key(0), x0, jnp.array([0, 1]), ctx0)
    return pp, params, devices


def test_params_placed_on_stage_devices(pp_setup):
    pp, params, devices = pp_setup
    placed = pp.place_params(params)
    for key in pp.keys:
        for leaf in jax.tree.leaves(placed[key]):
            assert leaf.devices() == {pp.device_of[key]}, (
                f"stage {key} leaf on {leaf.devices()}, "
                f"expected {pp.device_of[key]}"
            )
    # idempotent
    again = pp.place_params(placed)
    assert again is placed


def test_pipelined_forward_matches_monolith(pp_setup):
    pp, params, _ = pp_setup
    x = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (4, 77, 24))
    t = jnp.array([0, 5, 9, 13])
    ref = SDUNet(TINY_SD).apply(params, x, t, ctx)

    placed = pp.place_params(params)
    out = pp(placed, x, t, ctx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_microbatched_matches_whole_batch(pp_setup):
    pp, params, _ = pp_setup
    x = jax.random.normal(jax.random.key(3), (8, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(4), (8, 77, 24))
    t = jnp.arange(8)
    placed = pp.place_params(params)
    whole = pp(placed, x, t, ctx)
    piped = pp(placed, x, t, ctx, num_microbatches=4)
    # chunked batches compile separate programs whose fusion order differs
    # in float32 — same tolerance as the monolith comparisons
    np.testing.assert_allclose(
        np.asarray(piped), np.asarray(whole), rtol=2e-5, atol=2e-5
    )
    with pytest.raises(ValueError, match="not divisible"):
        pp(placed, x, t, ctx, num_microbatches=3)


def test_fewer_devices_than_stages(pp_setup):
    _, params, _ = pp_setup
    pp2 = PipelinedSDUNet(TINY_SD, devices=jax.devices()[:3])
    x = jax.random.normal(jax.random.key(5), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(6), (2, 77, 24))
    t = jnp.array([1, 2])
    ref = SDUNet(TINY_SD).apply(params, x, t, ctx)
    out = pp2(pp2.place_params(params), x, t, ctx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
