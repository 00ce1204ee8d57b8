"""Segmented per-stage-VJP training must produce the same gradients and
loss as jax.grad through the monolithic SDUNet."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phendiff_tpu.core import SchedulerConfig, make_schedule
from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.train.ema import EMAConfig, ema_update
from phendiff_tpu.train.segmented_train import SegmentedSDTrainStep

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
SCHED = make_schedule(SchedulerConfig(num_train_timesteps=20, clip_sample=False))


def _setup():
    model = SDUNet(CFG, dtype=jnp.float32)
    lat = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 16)) * 0.1
    params = model.init(
        jax.random.key(2), lat, jnp.zeros((2,), jnp.int32), ctx
    )
    return model, params, lat, ctx


def test_segmented_gradient_values_match():
    """Loss + leaf-by-leaf gradients + the conditioning gradient all match
    monolithic jax.grad."""
    model, params, lat, ctx = _setup()
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    step = SegmentedSDTrainStep(seg, SCHED, optax.sgd(1.0))
    rng = jax.random.key(11)
    noisy, target, weight, t, ctx_used = step._prepare(lat, ctx, rng)

    def mono_loss(p, c):
        pred = model.apply(p, noisy, t, c)
        return jnp.mean(jnp.square(pred - target))

    ref_loss, (ref_grads, ref_ctx_grad) = jax.value_and_grad(
        mono_loss, argnums=(0, 1)
    )(params, ctx)

    # lr=1 SGD: new_param = param - grad → grad = param - new_param
    opt_state = step.init_opt_state(params)
    p2, _, _, m = step(params, opt_state, lat, ctx, rng)
    assert np.isclose(float(m["loss"]), float(ref_loss), rtol=1e-5)
    assert float(m["nonfinite"]) == 0.0
    np.testing.assert_allclose(
        np.asarray(m["ctx_grad"]), np.asarray(ref_ctx_grad),
        rtol=2e-4, atol=1e-7,
    )
    seg_grads = jax.tree.map(lambda a, b: a - b, params, p2)

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_seg = jax.tree_util.tree_flatten_with_path(seg_grads)[0]
    assert len(flat_ref) == len(flat_seg)
    for (path_r, gr), (path_s, gs) in zip(flat_ref, flat_seg):
        assert path_r == path_s
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gr), rtol=2e-4, atol=1e-6,
            err_msg=str(path_r),
        )


def test_segmented_step_learns():
    """With a real learning rate the loss decreases over steps and every
    parameter receives a gradient (catches dropped cotangent routes)."""
    model, params, lat, ctx = _setup()
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    step = SegmentedSDTrainStep(seg, SCHED, optax.adam(1e-3))
    opt_state = step.init_opt_state(params)
    losses = []
    p = params
    for i in range(8):
        p, opt_state, _, m = step(p, opt_state, lat, ctx, jax.random.key(3))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # every leaf moved (adam moves any leaf with nonzero grad; a leaf that
    # never moves signals a dropped cotangent path)
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(params))
    ]
    assert all(moved), f"{moved.count(False)} leaves received no update"


def test_segmented_step_bf16_compute():
    """Mixed precision: the loss-head cotangent must carry the network's
    bf16 output dtype (regression: f32 cotangent vs bf16 output)."""
    seg = SegmentedSDUNet(CFG, dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 16)) * 0.1
    params = seg.init(jax.random.key(2), lat, jnp.zeros((2,), jnp.int32), ctx)
    step = SegmentedSDTrainStep(seg, SCHED, optax.adam(1e-3))
    opt_state = step.init_opt_state(params)
    p, _, _, m = step(params, opt_state, lat, ctx, jax.random.key(4))
    assert np.isfinite(float(m["loss"]))


def test_segmented_v_prediction_and_cfg_dropout_and_ema():
    """v-prediction targets, shared-key CFG dropout, and per-stage EMA all
    run; the EMA tree tracks the reference decay law."""
    sched_v = make_schedule(SchedulerConfig(
        num_train_timesteps=20, clip_sample=False,
        prediction_type="v_prediction",
    ))
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    lat = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 16)) * 0.1
    params = seg.init(jax.random.key(2), lat, jnp.zeros((2,), jnp.int32), ctx)
    ema_cfg = EMAConfig()
    step = SegmentedSDTrainStep(
        seg, sched_v, optax.adam(1e-3), proba_uncond=0.5, ema=ema_cfg,
    )
    opt_state = step.init_opt_state(params)
    ema0 = jax.tree.map(lambda x: x, params)
    p, opt_state, ema1, m = step(
        params, opt_state, lat, ctx, jax.random.key(5),
        ema_params=ema0, step=0,
    )
    assert np.isfinite(float(m["loss"]))
    # per-stage EMA == whole-tree EMA (per-leaf law)
    ref_ema = ema_update(ema_cfg, ema0, p, 1)
    for a, b in zip(jax.tree.leaves(ema1), jax.tree.leaves(ref_ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_unknown_prediction_type_rejected():
    """An invalid prediction_type cannot reach the train step: the config
    itself rejects it at construction (and SegmentedSDTrainStep guards
    again for configs built by other means)."""
    import pytest

    sched = make_schedule(SchedulerConfig(num_train_timesteps=20))
    with pytest.raises(ValueError, match="prediction_type"):
        sched.config.replace(prediction_type="nope")
