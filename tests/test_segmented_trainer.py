"""SegmentedSDTrainer: the full-width SD fine-tune as a REAL training run
(epoch loop, checkpoints, exact resume, EMA-weighted eval + best-model
save, class-embedding training) — reference train.py:367-432 +
utils_training.py:541-640 — plus stepwise-sampler numerics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.metrics.fidelity import MetricsConfig
from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.pipelines import conditional_ddim as cd
from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline
from phendiff_tpu.train.eval_loop import EvalConfig
from phendiff_tpu.train.segmented_trainer import SegmentedSDTrainer
from phendiff_tpu.train.train_loop import OptimizerConfig, TrainConfig
from phendiff_tpu.train.trainer import RunPaths, TrainerConfig

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
SCHED = SchedulerConfig(num_train_timesteps=20, clip_sample=False)


def make_pipe():
    return SDImg2ImgPipeline.init_random(
        TINY_SD, TINY_VAE, SCHED, num_classes=2, class_embedding_dim=16, seed=0
    )


def make_config(data_dir, **overrides):
    base = dict(
        train_data_dir=str(data_dir),
        definition=(16, 16),
        train_batch_size=8,
        num_epochs=1,
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
    return RunPaths.create(str(tmp_path), "exp", "segrun")


def test_training_runs_clips_and_checkpoints(tiny_image_root, paths):
    pipe = make_pipe()
    ce_before = np.asarray(
        jax.tree.leaves(pipe.class_embedding_params)[0]
    ).copy()
    trainer = SegmentedSDTrainer(pipe, make_config(tiny_image_root), paths)
    assert trainer.step_fn.max_grad_norm == 1.0  # reference default clip
    out = trainer.run()
    assert trainer.global_step == 4  # 32 imgs / batch 8 x 1 epoch
    assert trainer.ckpt.latest_step() == 4
    # loss + grad_norm logged
    import json

    with open(os.path.join(paths.run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) >= 4
    assert all(np.isfinite(r["loss"]) for r in recs)
    assert all("grad_norm" in r for r in recs)
    # the class embedding trained (ctx stage wired through the optimizer)
    ce_after = np.asarray(
        out["params"]["params"]["class_embedding"]["embedding"]["embedding"]
    )
    assert not np.allclose(ce_before, ce_after)
    # the pipeline object's own params were not donated away
    assert np.asarray(jax.tree.leaves(pipe.unet_params)[0]).size


def test_resume_restores_exact_state(tiny_image_root, paths):
    pipe = make_pipe()
    t1 = SegmentedSDTrainer(pipe, make_config(tiny_image_root), paths)
    out1 = t1.run()  # 4 steps, checkpoint at 4

    t2 = SegmentedSDTrainer(
        make_pipe(),
        make_config(
            tiny_image_root, num_epochs=2, resume_from_checkpoint="latest"
        ),
        paths,
    )
    first_epoch, skip = t2.maybe_resume()
    assert (first_epoch, skip) == (1, 0)
    assert t2.global_step == 4
    # bit-exact round trip of params, EMA, and a deep optimizer leaf
    for a, b in zip(
        jax.tree.leaves(out1["params"]), jax.tree.leaves(t2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(out1["ema"]), jax.tree.leaves(t2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(out1["opt"]), jax.tree.leaves(t2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out2 = t2.run()  # continues into epoch 2
    assert t2.global_step == 8
    assert int(out2["step"]) == 8


def test_denoiser_only_freezes_embedding(tiny_image_root, paths):
    pipe = make_pipe()
    ce_before = np.asarray(jax.tree.leaves(pipe.class_embedding_params)[0]).copy()
    trainer = SegmentedSDTrainer(
        pipe, make_config(tiny_image_root), paths,
        components_to_train=("denoiser",),
    )
    out = trainer.run()
    ce_after = np.asarray(
        out["params"]["params"]["class_embedding"]["embedding"]["embedding"]
    )
    np.testing.assert_array_equal(ce_before, ce_after)


def test_eval_best_model_save_and_reload(tiny_image_root, paths):
    pipe = make_pipe()
    cfg = make_config(
        tiny_image_root, eval_every_epochs=1, compute_metrics=True
    )
    trainer = SegmentedSDTrainer(pipe, cfg, paths)
    trainer.run()
    assert trainer.best_metric < float("inf")
    assert os.path.exists(
        os.path.join(paths.full_pipeline_save, "model_index.json")
    )
    reloaded = SDImg2ImgPipeline.from_pretrained(paths.full_pipeline_save)
    assert reloaded.unet_config == TINY_SD
    # saved weights are the EMA tree
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(reloaded.class_embedding_params)[0]),
        np.asarray(
            trainer.ema_params["params"]["class_embedding"]["embedding"]["embedding"]
        ),
        rtol=1e-6,
    )


def test_stepwise_sample_matches_scan_sampler():
    """ddim_sample_stepwise (host-driven, used for segmented eval
    generation) reproduces the lax.scan sampler's trajectory for identical
    arguments — pure-noise start, forward-noised start, with and without
    CFG (both equations)."""
    unet = SDUNet(TINY_SD, dtype=jnp.float32)
    lat = jnp.zeros((2, 4, 4, 4))
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 16)) * 0.1
    params = unet.init(jax.random.key(2), lat, jnp.zeros((2,), jnp.int32), ctx)

    def denoiser(x, t, seq):
        return unet.apply(params, x, t, seq)

    from phendiff_tpu.core import make_schedule

    schedule = make_schedule(SCHED)
    k = jax.random.key(9)
    shape = (2, 4, 4, 4)
    start = jax.random.normal(jax.random.key(10), shape) * 0.5
    cases = [
        dict(shape=shape, rng=k, guidance=cd.GuidanceConfig(0.0)),
        dict(shape=shape, rng=k, guidance=cd.GuidanceConfig(2.0)),
        dict(shape=shape, rng=k, guidance=cd.GuidanceConfig(0.5, "cfg")),
        dict(
            start_image=start, rng=k, add_forward_noise=True,
            frac_diffusion_skipped=0.4, guidance=cd.GuidanceConfig(2.5),
        ),
    ]
    for kw in cases:
        got = cd.ddim_sample_stepwise(
            denoiser, schedule, ctx, num_inference_steps=5, **kw
        )
        want = cd.ddim_sample(
            denoiser, schedule, ctx, num_inference_steps=5, **kw
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6,
            err_msg=str(kw),
        )


def test_segmented_attention_fine_tuning_trains_only_attention(
    tiny_image_root, paths
):
    """VERDICT r3 #5a: --attention_fine_tuning on the SEGMENTED route via
    per-leaf multi_transform routing — exactly the Transformer2D leaves
    (and the still-active class embedding) change; every other UNet leaf
    is BIT-EXACT frozen (reference train.py:202-220)."""
    from phendiff_tpu.train.trainer import _ATTENTION_MODULE_RE

    pipe = make_pipe()
    trainer = SegmentedSDTrainer(
        pipe, make_config(tiny_image_root), paths,
        components_to_train=("denoiser", "class_embedding"),
        attention_fine_tuning=True,
    )
    before = jax.tree.map(np.asarray, trainer.params)
    out = trainer.run()
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, out["params"])
    )[0]
    assert len(flat_b) == len(flat_a)
    n_attn = n_frozen = 0
    for (path_b, b), (path_a, a) in zip(flat_b, flat_a):
        assert path_b == path_a
        keys = [str(getattr(k, "key", "")) for k in path_b]
        module = keys[1]  # {"params": {<module>: ...}}
        if module == "class_embedding" or _ATTENTION_MODULE_RE.match(module):
            n_attn += 1
            assert not np.array_equal(a, b), f"should train: {path_b}"
        else:
            n_frozen += 1
            np.testing.assert_array_equal(a, b, err_msg=str(path_b))
    assert n_attn > 1 and n_frozen > 0


def test_segmented_attention_fine_tuning_requires_denoiser(
    tiny_image_root, paths
):
    with pytest.raises(ValueError, match="denoiser"):
        SegmentedSDTrainer(
            make_pipe(), make_config(tiny_image_root), paths,
            components_to_train=("class_embedding",),
            attention_fine_tuning=True,
        )
