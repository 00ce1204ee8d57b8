"""Segmented per-stage-VJP training must produce the same gradients and
loss as jax.grad through the monolithic SDUNet."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phendiff_tpu.core import SchedulerConfig, make_schedule
from phendiff_tpu.core import scheduler as S
from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
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


def test_segmented_gradients_match_monolithic():
    model, params, lat, ctx = _setup()
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    opt = optax.sgd(0.0)  # lr 0: isolates the gradient comparison
    step = SegmentedSDTrainStep(seg, SCHED, opt)
    rng = jax.random.key(7)

    # reproduce the step's own noise/t draw for the monolithic reference
    noisy, noise, t = step._prepare(lat, rng)

    def mono_loss(p):
        pred = model.apply(p, noisy, t, ctx)
        return jnp.mean(jnp.square(pred - noise))

    ref_loss, ref_grads = jax.value_and_grad(mono_loss)(params)

    opt_state = step.init_opt_state(params)
    _, _, metrics = step(params, opt_state, lat, ctx, rng)
    assert np.isclose(float(metrics["loss"]), float(ref_loss), rtol=1e-5)

    # run the backward bookkeeping directly for gradient comparison
    grads = {}
    p2, _, _ = step(params, opt_state, lat, ctx, rng)
    # lr=0 SGD: params must be unchanged — updates applied correctly
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmented_step_learns():
    """With a real learning rate the loss decreases over steps and every
    parameter receives a gradient (catches dropped cotangent routes)."""
    model, params, lat, ctx = _setup()
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    step = SegmentedSDTrainStep(seg, SCHED, optax.adam(1e-3))
    opt_state = step.init_opt_state(params)
    rng = jax.random.key(3)
    losses = []
    p = params
    for i in range(8):
        p, opt_state, m = step(p, opt_state, lat, ctx, jax.random.key(3))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # every leaf moved (adam moves any leaf with nonzero grad; a leaf that
    # never moves signals a dropped cotangent path)
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(params))
    ]
    assert all(moved), f"{moved.count(False)} leaves received no update"


def test_segmented_gradient_values_match():
    """Leaf-by-leaf gradient comparison against monolithic jax.grad."""
    model, params, lat, ctx = _setup()
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    step = SegmentedSDTrainStep(seg, SCHED, optax.sgd(1.0))
    rng = jax.random.key(11)
    noisy, noise, t = step._prepare(lat, rng)

    def mono_loss(p):
        pred = model.apply(p, noisy, t, ctx)
        return jnp.mean(jnp.square(pred - noise))

    ref_grads = jax.grad(mono_loss)(params)

    # lr=1 SGD: new_param = param - grad → grad = param - new_param
    opt_state = step.init_opt_state(params)
    p2, _, _ = step(params, opt_state, lat, ctx, rng)
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


def test_segmented_step_bf16_compute():
    """Mixed precision: the loss-head cotangent must carry the network's
    bf16 output dtype (regression: f32 cotangent vs bf16 output)."""
    seg = SegmentedSDUNet(CFG, dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 16)) * 0.1
    params = seg.init(jax.random.key(2), lat, jnp.zeros((2,), jnp.int32), ctx)
    step = SegmentedSDTrainStep(seg, SCHED, optax.adam(1e-3))
    opt_state = step.init_opt_state(params)
    p, _, m = step(params, opt_state, lat, ctx, jax.random.key(4))
    assert np.isfinite(float(m["loss"]))
