"""End-to-end Trainer tests: the minimum end-to-end slice of SURVEY.md §7
(tiny conditional DDIM on the tiny imagefolder, data-parallel on the
8-device CPU mesh), plus resume and SD fine-tune paths."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.metrics.fidelity import MetricsConfig
from phendiff_tpu.models import UNet2DConfig
from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
from phendiff_tpu.models.sd_unet import SDUNetConfig
from phendiff_tpu.pipelines import ConditionalDDIMPipeline
from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline
from phendiff_tpu.train.eval_loop import EvalConfig
from phendiff_tpu.train.train_loop import OptimizerConfig, TrainConfig
from phendiff_tpu.train.trainer import (
    RunPaths,
    TrainerConfig,
    for_ddim_pipeline,
    for_sd_pipeline,
)

TINY_UNET = UNet2DConfig(
    sample_size=16,
    block_out_channels=(8, 8),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    num_class_embeds=2,
)
SCHED = SchedulerConfig(num_train_timesteps=20, clip_sample=False)


def make_config(data_dir, tmp, **overrides):
    base = dict(
        train_data_dir=str(data_dir),
        definition=(16, 16),
        train_batch_size=8,
        num_epochs=2,
        eval_every_epochs=None,
        checkpointing_steps=2,
        mixed_precision="no",
        compute_metrics=False,
        train=TrainConfig(
            proba_uncond=0.1,
            optimizer=OptimizerConfig(learning_rate=1e-3, total_steps=50),
        ),
        eval=EvalConfig(
            nb_generated_images=4, eval_batch_size=4, num_inference_steps=2,
            metrics=MetricsConfig(fid=True, isc=False, kid=False),
        ),
        tracker="jsonl",
    )
    base.update(overrides)
    return TrainerConfig(**base)


@pytest.fixture
def paths(tmp_path):
    return RunPaths.create(str(tmp_path), "exp", "run0")


def test_run_paths_layout(tmp_path):
    p = RunPaths.create(str(tmp_path), "exp", "run1")
    assert os.path.isdir(p.checkpoints)
    assert os.path.isdir(p.fidelity_cache)
    assert p.fidelity_cache == os.path.join(str(tmp_path), ".fidelity_cache")


def test_ddim_training_runs_and_checkpoints(tiny_image_root, paths):
    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(tiny_image_root, paths)
    trainer = for_ddim_pipeline(pipe, cfg, paths)
    assert len(trainer.loader) == 4  # 32 imgs / batch 8
    state = trainer.run()
    assert int(state.step) == 8  # 2 epochs x 4 batches
    assert trainer.ckpt.latest_step() == 8
    # metrics were logged
    with open(os.path.join(paths.run_dir, "metrics.jsonl")) as f:
        lines = f.readlines()
    assert len(lines) >= 8


def test_ddim_resume_continues(tiny_image_root, paths):
    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(tiny_image_root, paths, num_epochs=1)
    t1 = for_ddim_pipeline(pipe, cfg, paths)
    t1.run()  # 4 steps

    cfg2 = make_config(
        tiny_image_root, paths, num_epochs=2, resume_from_checkpoint="latest"
    )
    t2 = for_ddim_pipeline(pipe, cfg2, paths)
    first_epoch, skip = t2.maybe_resume()
    assert first_epoch == 1 and skip == 0
    assert int(t2.state.step) == 4
    state = t2.run()
    assert int(state.step) == 8


def test_ddim_eval_and_best_model_save(tiny_image_root, paths):
    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(
        tiny_image_root, paths, num_epochs=1, eval_every_epochs=1,
        compute_metrics=True,
    )
    trainer = for_ddim_pipeline(pipe, cfg, paths)
    trainer.run()
    # best pipeline was saved in diffusers layout
    assert os.path.exists(
        os.path.join(paths.full_pipeline_save, "model_index.json")
    )
    reloaded = ConditionalDDIMPipeline.from_pretrained(paths.full_pipeline_save)
    assert reloaded.unet_config == TINY_UNET
    # reference features were cached per class name
    cached = os.listdir(paths.fidelity_cache)
    assert any("DMSO" in c for c in cached)
    assert trainer.best_metric < float("inf")


TINY_SD = SDUNetConfig(
    sample_size=4,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=(2, 4),
    norm_num_groups=4,
)
TINY_VAE = AutoencoderKLConfig(
    block_out_channels=(8, 16, 16), layers_per_block=1, norm_num_groups=4,
    latent_channels=4, sample_size=16,
)


def test_sd_finetune_frozen_vae(tiny_image_root, paths):
    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )
    vae_before = jax.tree.leaves(pipe.vae_params)[0].copy()
    unet_before = np.asarray(jax.tree.leaves(pipe.unet_params)[0]).copy()
    cfg = make_config(tiny_image_root, paths, num_epochs=1)
    trainer = for_sd_pipeline(pipe, cfg, paths)
    state = trainer.run()
    assert int(state.step) == 4
    # unet moved, vae untouched (frozen by construction)
    unet_after = np.asarray(jax.tree.leaves(state.params["unet"])[0])
    assert not np.allclose(unet_before, unet_after)
    np.testing.assert_array_equal(
        np.asarray(vae_before), np.asarray(jax.tree.leaves(pipe.vae_params)[0])
    )


def test_sd_finetune_class_embedding_only(tiny_image_root, paths):
    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )
    unet_before = np.asarray(jax.tree.leaves(pipe.unet_params)[0]).copy()
    cfg = make_config(tiny_image_root, paths, num_epochs=1)
    trainer = for_sd_pipeline(
        pipe, cfg, paths, components_to_train=("class_embedding",)
    )
    state = trainer.run()
    unet_after = np.asarray(jax.tree.leaves(state.params["unet"])[0])
    np.testing.assert_array_equal(unet_before, unet_after)  # frozen
    ce_b = np.asarray(
        jax.tree.leaves(pipe.class_embedding_params)[0]
    )
    ce_a = np.asarray(jax.tree.leaves(state.params["class_embedding"])[0])
    assert not np.allclose(ce_b, ce_a)  # trained


def test_attention_param_mask_exact_leaves():
    """The mask keys on exact attention-module names (regression for the
    'attn'-substring brittleness): exactly the attention blocks are
    trainable; the DDIM-internal class embedding stays frozen."""
    from phendiff_tpu.train.trainer import attention_param_mask

    cfg = UNet2DConfig(
        sample_size=8,
        block_out_channels=(8, 8),
        down_block_types=("AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
        num_class_embeds=2,
        attention_head_dim=4,
    )
    pipe = ConditionalDDIMPipeline.init_random(cfg, SCHED, seed=0)
    mask = attention_param_mask(pipe.params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable_mods = {p[1].key for p, v in flat if v}
    frozen_mods = {p[1].key for p, v in flat if not v}
    # up blocks run layers_per_block+1 resnet(+attn) layers (skip concat)
    assert trainable_mods == {
        "down_0_attn_0", "mid_attn", "up_1_attn_0", "up_1_attn_1"
    }
    assert "class_embedding" in frozen_mods
    assert not trainable_mods & frozen_mods
    # a module whose name merely contains "attn" is NOT matched
    m2 = attention_param_mask(
        {"params": {"my_attn_extras": {"w": 0}, "mid_attn": {"w": 0}}}
    )
    assert m2["params"]["my_attn_extras"]["w"] is False
    assert m2["params"]["mid_attn"]["w"] is True


def test_sd_attention_fine_tuning_trains_only_attention(tiny_image_root, paths):
    """One SD run with --attention_fine_tuning: exactly the Transformer2D
    leaves change; every other UNet leaf and the class embedding are
    bit-identical (reference train.py:202-220)."""
    from phendiff_tpu.train.trainer import _ATTENTION_MODULE_RE

    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )
    cfg = make_config(tiny_image_root, paths, num_epochs=1)
    trainer = for_sd_pipeline(
        pipe, cfg, paths, components_to_train=("denoiser",),
        attention_fine_tuning=True,
    )
    before = {
        "unet": jax.tree.map(np.asarray, pipe.unet_params),
        "class_embedding": jax.tree.map(np.asarray, pipe.class_embedding_params),
    }
    state = trainer.run()
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, state.params)
    )[0]
    assert len(flat_b) == len(flat_a)
    n_attn = 0
    for (path_b, b), (path_a, a) in zip(flat_b, flat_a):
        assert path_b == path_a
        keys = [getattr(k, "key", "") for k in path_b]
        in_attn = keys[0] == "unet" and any(
            _ATTENTION_MODULE_RE.match(str(k)) for k in keys
        )
        if in_attn:
            n_attn += 1
            assert not np.array_equal(a, b), f"attention leaf frozen: {path_b}"
        else:
            np.testing.assert_array_equal(a, b, err_msg=str(path_b))
    assert n_attn > 0


def test_sd_attention_fine_tuning_requires_denoiser(tiny_image_root, paths):
    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )
    cfg = make_config(tiny_image_root, paths, num_epochs=1)
    with pytest.raises(ValueError, match="denoiser"):
        for_sd_pipeline(
            pipe, cfg, paths, components_to_train=("class_embedding",),
            attention_fine_tuning=True,
        )


def test_eval_shard_pads_non_divisible(tiny_image_root, paths):
    """VERDICT r3 #8: a non-divisible eval batch is PADDED to the mesh size
    (cycling the batch) so generation stays data-parallel, instead of the
    old warn-and-replicate fallback that ran on one device.  Matches the
    reference keeping all ranks on eval work (utils_training.py:128-139)."""
    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(
        tiny_image_root, paths, num_epochs=1, compute_metrics=True,
        eval=EvalConfig(
            nb_generated_images=6, eval_batch_size=6, num_inference_steps=2,
            metrics=MetricsConfig(fid=True, isc=False, kid=False),
        ),
    )
    trainer = for_ddim_pipeline(pipe, cfg, paths)
    dp = jax.device_count()
    assert 6 % dp != 0  # the case under test

    labels = jnp.asarray([0, 1, 0, 1, 0, 1], dtype=jnp.int32)
    sharded = trainer.evaluator.shard_fn(labels)
    assert sharded.shape[0] == 8  # padded to the next multiple of dp
    assert len(sharded.sharding.device_set) == dp  # data-parallel, not 1 dev
    np.testing.assert_array_equal(  # cycled padding
        np.asarray(sharded), [0, 1, 0, 1, 0, 1, 0, 1]
    )

    # end-to-end eval over the padded batches: trims back to nb_generated
    metrics = trainer.evaluator.evaluate(
        trainer.generate_fn_builder(trainer.state), 0
    )
    assert "main_metric_mean" in metrics


def test_eval_generation_compiles_once(tiny_image_root, paths):
    """VERDICT r1 weak #2: repeat eval passes must not re-trace the
    sampling scan — the jitted generate keeps EMA params as a traced
    argument, so a second eval with fresh EMA weights reuses the cache."""
    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(tiny_image_root, paths)
    trainer = for_ddim_pipeline(pipe, cfg, paths)

    rng = jax.random.key(0)
    labels = jnp.zeros((4,), dtype=jnp.int32)

    gen1 = trainer.generate_fn_builder(trainer.state)
    out1 = gen1(labels, rng, 2)
    assert out1.shape == (4, 16, 16, 3)
    n_compiles = gen1.jitted._cache_size()

    # new EMA tree (as a later eval pass would see) → no new trace
    state2 = trainer.state.replace(
        ema_params=jax.tree.map(lambda x: x * 1.01, trainer.state.ema_params)
    )
    gen2 = trainer.generate_fn_builder(state2)
    out2 = gen2(labels, rng, 2)
    assert gen2.jitted._cache_size() == n_compiles
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_sd_finetune_trains_vae_encoder(tiny_image_root, paths):
    """VERDICT r3 #5b: 'autoencoder' in components_to_train trains the VAE
    through the diffusion loss (encode inside the gradient) — encoder +
    quant_conv leaves move; decoder / post_quant_conv stay bit-exact (the
    reference's decoder never receives a gradient from this loss either,
    train.py:188-199 + optimizer collection :268-271)."""
    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )
    vae_before = jax.tree.map(np.asarray, pipe.vae_params)
    cfg = make_config(tiny_image_root, paths, num_epochs=1)
    trainer = for_sd_pipeline(
        pipe, cfg, paths,
        components_to_train=("denoiser", "class_embedding", "autoencoder"),
    )
    state = trainer.run()
    vae_after = jax.tree.map(np.asarray, state.params["vae"])
    for mod in ("encoder", "quant_conv"):
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(
                jax.tree.leaves(vae_before["params"][mod]),
                jax.tree.leaves(vae_after["params"][mod]),
            )
        )
        assert moved, f"vae {mod} should have trained"
    for mod in ("decoder", "post_quant_conv"):
        for a, b in zip(
            jax.tree.leaves(vae_before["params"][mod]),
            jax.tree.leaves(vae_after["params"][mod]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the saved pipeline carries the (EMA) VAE
    trainer.save_pipeline_fn(state, paths.full_pipeline_save)
    reloaded = SDImg2ImgPipeline.from_pretrained(paths.full_pipeline_save)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(reloaded.vae_params)[0]),
        np.asarray(jax.tree.leaves(state.ema_params["vae"])[0]),
        rtol=1e-6,
    )


def test_sd_rejects_unknown_component(tiny_image_root, paths):
    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )
    cfg = make_config(tiny_image_root, paths)
    with pytest.raises(ValueError, match="unknown components_to_train"):
        for_sd_pipeline(pipe, cfg, paths, components_to_train=("vae",))


def test_probe_sd_monolithic_compile_tiny(tiny_image_root, paths):
    """The --segmented_sd auto probe: AOT-lowers the monolithic SD train
    step from abstract inputs; on a backend that takes the HLO it returns
    True without allocating any state."""
    from phendiff_tpu.train.trainer import probe_sd_monolithic_compile

    pipe = SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )
    cfg = make_config(tiny_image_root, paths)
    assert probe_sd_monolithic_compile(pipe, cfg) is True


def test_init_train_state_adopt_mode():
    """copy=False must ADOPT the caller's arrays (full-width memory
    contract: no second param tree)."""
    import optax

    from phendiff_tpu.train.train_loop import init_train_state

    params = {"w": jnp.ones((4, 4))}
    opt = optax.adamw(1e-3)
    adopted = init_train_state(params, opt, copy=False)
    assert adopted.params["w"] is params["w"]
    copied = init_train_state(params, opt)  # default copies
    assert copied.params["w"] is not params["w"]


def test_trainer_deferred_metrics_logs_every_step(tiny_image_root, paths):
    """The one-step-deferred flush must still log one record per step,
    with the host-phase split (perf/t_data_s / t_dispatch_s / t_await_s)."""
    import json

    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(tiny_image_root, paths, num_epochs=1,
                      checkpointing_steps=10**9)
    trainer = for_ddim_pipeline(pipe, cfg, paths)
    state = trainer.run()
    recs = [json.loads(l) for l in open(
        os.path.join(paths.run_dir, "metrics.jsonl"))]
    steps = [r["step"] for r in recs]
    assert steps == list(range(1, int(state.step) + 1))
    last = recs[-1].get("metrics", recs[-1])
    for k in ("perf/t_data_s", "perf/t_dispatch_s", "perf/t_await_s", "loss"):
        assert any(k in r.get("metrics", r) for r in recs), k


def test_trainer_metrics_flush_every_batches(tiny_image_root, paths):
    """metrics_flush_every=3 must still log every step exactly once, in
    order, with the same loss values a per-step flush would record."""
    import json

    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(tiny_image_root, paths, num_epochs=1,
                      checkpointing_steps=10**9)
    cfg.metrics_flush_every = 3
    trainer = for_ddim_pipeline(pipe, cfg, paths)
    state = trainer.run()
    recs = [json.loads(l) for l in open(
        os.path.join(paths.run_dir, "metrics.jsonl"))]
    steps = [r["step"] for r in recs]
    assert steps == list(range(1, int(state.step) + 1))
    assert all(np.isfinite(r.get("metrics", r)["loss"]) for r in recs)


def test_trainer_upload_uint8_trains(tiny_image_root, paths):
    """uint8 transport: loader ships quantized pixels, step normalizes on
    device; training must run and the quantization must stay within 1/255
    of the f32 pipeline's pixel values."""
    from phendiff_tpu.data.imagefolder import (
        ImageFolderLoader, LoaderConfig, scan_imagefolder,
    )

    idx = scan_imagefolder(str(tiny_image_root))
    a = ImageFolderLoader(idx, LoaderConfig(
        batch_size=4, definition=(16, 16), shuffle=False, seed=0))
    b = ImageFolderLoader(idx, LoaderConfig(
        batch_size=4, definition=(16, 16), shuffle=False, seed=0,
        transport="uint8"))
    (xf, lf), = [next(iter(a.epoch(0)))]
    (xu, lu), = [next(iter(b.epoch(0)))]
    assert xu.dtype == np.uint8
    np.testing.assert_array_equal(lf, lu)
    back = xu.astype(np.float32) / 127.5 - 1.0
    assert np.max(np.abs(back - xf)) <= (1.0 / 127.5)

    pipe = ConditionalDDIMPipeline.init_random(TINY_UNET, SCHED, seed=0)
    cfg = make_config(tiny_image_root, paths, num_epochs=1,
                      checkpointing_steps=10**9)
    cfg.upload_uint8 = True
    trainer = for_ddim_pipeline(pipe, cfg, paths)
    state = trainer.run()
    assert int(state.step) > 0
