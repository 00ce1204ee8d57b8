"""Segmented SD UNet execution must match the monolithic module exactly
(same params, same math; only jit-program boundaries differ)."""

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig

CFG = SDUNetConfig(
    sample_size=8,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=2,
    cross_attention_dim=16,
    attention_head_dim=(2, 4),
    norm_num_groups=8,
)


def test_segmented_matches_monolithic():
    model = SDUNet(CFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    t = jnp.array([3, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 16)) * 0.1
    params = model.init(jax.random.key(2), x, t, ctx)

    mono = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))(
        params, x, t, ctx
    )
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)(params, x, t, ctx)
    assert seg.shape == mono.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(seg), np.asarray(mono), rtol=2e-5, atol=2e-5
    )


def test_segmented_init_matches_monolithic():
    """Seed-for-seed reproducibility across execution paths: the
    stage-by-stage init must produce the SAME parameter values as the
    monolithic ``SDUNet.init`` (Flax folds the params rng by module path;
    stage children carry the monolith's root-level names)."""
    model = SDUNet(CFG, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 16))
    mono = model.init(jax.random.key(7), x, t, ctx)
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32).init(
        jax.random.key(7), x, t, ctx
    )
    flat_m = jax.tree_util.tree_flatten_with_path(mono)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(seg)[0]
    assert [p for p, _ in flat_m] == [p for p, _ in flat_s]
    for (path, a), (_, b) in zip(flat_m, flat_s):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(path)
        )


def test_segmented_missing_params_fail_loudly():
    seg = SegmentedSDUNet(CFG)
    x = jnp.zeros((1, 8, 8, 4))
    bad = {"params": {"conv_in": {"kernel": jnp.zeros((3, 3, 4, 16)),
                                  "bias": jnp.zeros((16,))}}}
    try:
        seg(bad, x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 16)))
    except Exception:
        return
    raise AssertionError("expected a loud failure on missing param subtrees")


def test_input_vjp_matches_monolithic_grad():
    """forward_with_input_vjp's latent cotangent equals jax.grad of the
    monolithic module w.r.t. the INPUT (VERDICT r3 #4's chain), for a
    generic scalar readout."""
    model = SDUNet(CFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    t = jnp.array([3, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 16)) * 0.1
    params = model.init(jax.random.key(2), x, t, ctx)
    w = jax.random.normal(jax.random.key(3), x.shape)  # generic cotangent

    want_out, want_vjp = jax.vjp(lambda xx: model.apply(params, xx, t, ctx), x)
    (want_dx,) = want_vjp(w)

    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    got_out, vjp_fn = seg.forward_with_input_vjp(params, x, t, ctx)
    got_dx = vjp_fn(w)

    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_dx), np.asarray(want_dx), rtol=5e-4, atol=1e-5
    )
