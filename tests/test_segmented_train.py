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
    noisy, target, weight, t, _keep = step._prepare(lat, rng)

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


def test_chained_global_norm_optimizer_rejected():
    """The per-stage application is only exact for per-leaf transforms:
    passing train_loop.make_optimizer's chain (clip_by_global_norm + adamw)
    must fail loudly instead of silently clipping per stage."""
    import pytest

    from phendiff_tpu.train.train_loop import OptimizerConfig, make_optimizer

    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    with pytest.raises(ValueError, match="max_grad_norm"):
        SegmentedSDTrainStep(seg, SCHED, make_optimizer(OptimizerConfig()))
    # a bare chained clip is equally rejected
    with pytest.raises(ValueError, match="PER-LEAF"):
        SegmentedSDTrainStep(
            seg, SCHED,
            optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3)),
        )


def _clipped_mono_grads(model, params, ctx, noisy, t, target, max_norm):
    def mono_loss(p):
        pred = model.apply(p, noisy, t, ctx)
        return jnp.mean(jnp.square(pred - target))

    grads = jax.grad(mono_loss)(params)
    clip = optax.clip_by_global_norm(max_norm)
    clipped, _ = clip.update(grads, clip.init(params))
    return clipped, optax.global_norm(grads)


def test_global_clip_cache_and_recompute_match_monolithic():
    """max_grad_norm with both clip modes reproduces monolithic
    jax.grad + optax.clip_by_global_norm leaf-for-leaf (reference
    utils_training.py:439-449 always clips at 1.0)."""
    model, params, lat, ctx = _setup()
    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    rng = jax.random.key(11)
    probe = SegmentedSDTrainStep(seg, SCHED, optax.sgd(1.0))
    noisy, target, weight, t, _ = probe._prepare(lat, rng)

    # pick a threshold BELOW the actual norm so clipping really triggers
    _, raw_norm = _clipped_mono_grads(model, params, ctx, noisy, t, target, 1.0)
    max_norm = float(raw_norm) / 2.0
    ref_clipped, _ = _clipped_mono_grads(
        model, params, ctx, noisy, t, target, max_norm
    )

    for mode in ("cache", "recompute"):
        step = SegmentedSDTrainStep(
            seg, SCHED, optax.sgd(1.0),
            max_grad_norm=max_norm, clip_mode=mode,
        )
        opt_state = step.init_opt_state(params)
        p2, _, _, m = step(params, opt_state, lat, ctx, rng)
        assert np.isclose(float(m["grad_norm"]), float(raw_norm), rtol=1e-5)
        seg_grads = jax.tree.map(lambda a, b: a - b, params, p2)
        flat_ref = jax.tree_util.tree_flatten_with_path(ref_clipped)[0]
        flat_seg = jax.tree_util.tree_flatten_with_path(seg_grads)[0]
        assert len(flat_ref) == len(flat_seg)
        for (path_r, gr), (path_s, gs) in zip(flat_ref, flat_seg):
            assert path_r == path_s
            np.testing.assert_allclose(
                np.asarray(gs), np.asarray(gr), rtol=2e-4, atol=1e-6,
                err_msg=f"{mode}: {path_r}",
            )


def test_ctx_stage_trains_class_embedding():
    """With ctx_module=CtxEmbed, the embedding table receives EXACTLY the
    monolithic gradient chained through pad_to_clip_sequence — the
    'ctx_grad never chained in product code' gap (reference trains the
    embedding via the padded sequence, utils_training.py:479-496)."""
    from phendiff_tpu.models.embeddings import pad_to_clip_sequence
    from phendiff_tpu.train.segmented_train import CtxEmbed

    model, params, lat, _ = _setup()
    ctx_mod = CtxEmbed(num_classes=2, embedding_dim=16, dtype=jnp.float32)
    labels = jnp.array([0, 1], jnp.int32)
    ctx_params = ctx_mod.init(jax.random.key(7), labels)
    full = {"params": dict(params["params"], **ctx_params["params"])}

    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    step = SegmentedSDTrainStep(seg, SCHED, optax.sgd(1.0), ctx_module=ctx_mod)
    rng = jax.random.key(11)
    noisy, target, weight, t, _ = step._prepare(lat, rng)

    table = ctx_params["params"]["class_embedding"]["embedding"]["embedding"]

    def mono_loss(tbl):
        ctx = pad_to_clip_sequence(tbl[labels])
        pred = model.apply(params, noisy, t, ctx)
        return jnp.mean(jnp.square(pred - target))

    ref_tbl_grad = jax.grad(mono_loss)(table)

    opt_state = step.init_opt_state(full)
    p2, opt2, _, m = step(full, opt_state, lat, labels, rng)
    assert "ctx_grad" not in m  # internalized — no dangling cotangent
    new_tbl = p2["params"]["class_embedding"]["embedding"]["embedding"]
    got_grad = table - new_tbl  # sgd(1.0)
    np.testing.assert_allclose(
        np.asarray(got_grad), np.asarray(ref_tbl_grad), rtol=2e-4, atol=1e-7
    )
    assert "ctx" in opt2


def test_ctx_stage_cfg_dropout_blocks_embedding_grad():
    """proba_uncond=1 zeroes the conditioning AND its gradient: a dropped
    batch must not move the embedding table (the reference's uncond pass
    never touches it — the find_unused_parameters hack, train.py:59-66)."""
    from phendiff_tpu.train.segmented_train import CtxEmbed

    _, params, lat, _ = _setup()
    ctx_mod = CtxEmbed(num_classes=2, embedding_dim=16, dtype=jnp.float32)
    labels = jnp.array([0, 1], jnp.int32)
    ctx_params = ctx_mod.init(jax.random.key(7), labels)
    full = {"params": dict(params["params"], **ctx_params["params"])}
    table = np.asarray(
        ctx_params["params"]["class_embedding"]["embedding"]["embedding"]
    )

    seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
    step = SegmentedSDTrainStep(
        seg, SCHED, optax.sgd(1.0), proba_uncond=1.0, ctx_module=ctx_mod
    )
    opt_state = step.init_opt_state(full)
    p2, _, _, _ = step(full, opt_state, lat, labels, jax.random.key(3))
    new_tbl = np.asarray(
        p2["params"]["class_embedding"]["embedding"]["embedding"]
    )
    np.testing.assert_array_equal(new_tbl, table)


def test_global_clip_with_ctx_stage_matches_monolithic():
    """The global norm spans UNet + embedding gradients together, exactly
    as the reference's clip over all trainable params."""
    from phendiff_tpu.models.embeddings import pad_to_clip_sequence
    from phendiff_tpu.train.segmented_train import CtxEmbed

    model, params, lat, _ = _setup()
    ctx_mod = CtxEmbed(num_classes=2, embedding_dim=16, dtype=jnp.float32)
    labels = jnp.array([0, 1], jnp.int32)
    ctx_params = ctx_mod.init(jax.random.key(7), labels)
    full = {"params": dict(params["params"], **ctx_params["params"])}
    rng = jax.random.key(11)
    probe = SegmentedSDTrainStep(seg := SegmentedSDUNet(CFG, dtype=jnp.float32),
                                 SCHED, optax.sgd(1.0))
    noisy, target, weight, t, _ = probe._prepare(lat, rng)
    table = ctx_params["params"]["class_embedding"]["embedding"]["embedding"]

    def mono_loss(p, tbl):
        ctx = pad_to_clip_sequence(tbl[labels])
        pred = model.apply(p, noisy, t, ctx)
        return jnp.mean(jnp.square(pred - target))

    grads, tbl_grad = jax.grad(mono_loss, argnums=(0, 1))(params, table)
    joint = {"unet": grads, "tbl": tbl_grad}
    raw_norm = float(optax.global_norm(joint))
    max_norm = raw_norm / 2.0
    clip = optax.clip_by_global_norm(max_norm)
    clipped, _ = clip.update(joint, clip.init(joint))

    for mode in ("cache", "recompute"):
        step = SegmentedSDTrainStep(
            seg, SCHED, optax.sgd(1.0), ctx_module=ctx_mod,
            max_grad_norm=max_norm, clip_mode=mode,
        )
        opt_state = step.init_opt_state(full)
        p2, _, _, m = step(full, opt_state, lat, labels, rng)
        assert np.isclose(float(m["grad_norm"]), raw_norm, rtol=1e-5)
        new_tbl = p2["params"]["class_embedding"]["embedding"]["embedding"]
        np.testing.assert_allclose(
            np.asarray(table - new_tbl), np.asarray(clipped["tbl"]),
            rtol=2e-4, atol=1e-7, err_msg=mode,
        )
        # spot-check a UNet leaf too
        got = (
            params["params"]["conv_in"]["kernel"]
            - p2["params"]["conv_in"]["kernel"]
        )
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(clipped["unet"]["params"]["conv_in"]["kernel"]),
            rtol=2e-4, atol=1e-7, err_msg=mode,
        )


def test_unknown_prediction_type_rejected():
    """An invalid prediction_type cannot reach the train step: the config
    itself rejects it at construction (and SegmentedSDTrainStep guards
    again for configs built by other means)."""
    import pytest

    sched = make_schedule(SchedulerConfig(num_train_timesteps=20))
    with pytest.raises(ValueError, match="prediction_type"):
        sched.config.replace(prediction_type="nope")


def test_bf16_gradient_cache_close_to_exact():
    """clip_mode='cache' with cache_dtype=bf16 (VERDICT r3 #2: 1.75 GB
    instead of 3.5 at full width): the global norm stays EXACT (computed
    before the cast); updates differ from the exact cache only by bf16
    rounding of the cached gradients."""
    import pytest

    _, params, lat, ctx = _setup()
    rng = jax.random.key(21)
    outs = {}
    for name, dt in (("exact", None), ("bf16", jnp.bfloat16)):
        seg = SegmentedSDUNet(CFG, dtype=jnp.float32)
        step = SegmentedSDTrainStep(
            seg, SCHED, optax.adamw(1e-3), max_grad_norm=0.5,
            clip_mode="cache", cache_dtype=dt,
        )
        opt_state = step.init_opt_state(params)
        p2, _, _, m = step(
            jax.tree.map(jnp.copy, params), opt_state, lat, ctx, rng
        )
        outs[name] = (p2, m)
    # exact norm regardless of cache dtype
    np.testing.assert_allclose(
        float(outs["exact"][1]["grad_norm"]),
        float(outs["bf16"][1]["grad_norm"]), rtol=0, atol=0,
    )
    a = np.concatenate([
        np.asarray(x).ravel() for x in jax.tree.leaves(outs["exact"][0])
    ])
    b = np.concatenate([
        np.asarray(x).ravel() for x in jax.tree.leaves(outs["bf16"][0])
    ])
    # params moved by ~lr per Adam step; bf16 grad rounding perturbs the
    # update direction slightly, bounded well below the step size
    assert np.max(np.abs(a - b)) < 5e-4
    assert not np.array_equal(a, b)  # the cast actually happened

    with pytest.raises(ValueError, match="cache_dtype"):
        SegmentedSDTrainStep(
            SegmentedSDUNet(CFG), SCHED, optax.adamw(1e-3),
            max_grad_norm=0.5, clip_mode="recompute",
            cache_dtype=jnp.bfloat16,
        )
