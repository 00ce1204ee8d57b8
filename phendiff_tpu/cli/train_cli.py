"""``python -m phendiff_tpu.cli.train_cli`` — the training entry point.

Capability parity with the reference's ``train.py`` orchestration
(``train.py:49-439``): parse args → validate → debug downscaling → run-dir
structure → pipeline factory → trainer → epoch loop with eval/checkpoints.
Single process drives the whole TPU mesh (no ``accelerate launch``).
"""

from __future__ import annotations

import sys

import jax

from phendiff_tpu.cli.args import (
    MAIN_METRIC_NAMES,
    build_parser,
    check_args,
    modify_args_for_debug,
)
from phendiff_tpu.cli.factory import load_initial_pipeline
from phendiff_tpu.core.precision import Policy
from phendiff_tpu.metrics.fidelity import MetricsConfig
from phendiff_tpu.pipelines.ddim_pipeline import ConditionalDDIMPipeline
from phendiff_tpu.train.ema import EMAConfig
from phendiff_tpu.train.eval_loop import EvalConfig
from phendiff_tpu.train.train_loop import OptimizerConfig, TrainConfig
from phendiff_tpu.train.trainer import (
    RunPaths,
    TrainerConfig,
    for_ddim_pipeline,
    for_sd_pipeline,
)


def banner(args, warnings):
    """Run-start summary (compact version of the reference's pretty banner,
    utils_misc.py:394-592)."""
    print("=" * 70)
    print(f" phendiff-tpu train :: {args.run_name}")
    print(f"   model_type={args.model_type} components={args.components_to_train}")
    print(f"   data={args.dataset_name or args.train_data_dir} definition={args.definition} "
          f"perc={args.perc_samples}%")
    print(f"   batch={args.train_batch_size} epochs={args.num_epochs} "
          f"lr={args.learning_rate} precision={args.mixed_precision}")
    print(f"   devices={jax.device_count()} ({jax.devices()[0].platform})")
    for w in warnings:
        print(f"   WARNING: {w}")
    print("=" * 70)


def trainer_config_from_args(args) -> TrainerConfig:
    return TrainerConfig(
        train_data_dir=args.train_data_dir,
        dataset_name=args.dataset_name,
        dataset_config_name=args.dataset_config_name,
        split=args.split,
        cache_dir=args.cache_dir,
        definition=tuple(args.definition),
        perc_samples=args.perc_samples,
        compute_metrics_full_dataset=args.compute_metrics_full_dataset,
        seed=args.seed,
        data_aug_on_the_fly=args.data_aug_on_the_fly,
        loader_prefetch=args.dataloader_prefetch_factor or 2,
        train_batch_size=args.train_batch_size,
        num_epochs=args.num_epochs,
        max_train_steps=args.max_num_steps,
        eval_every_epochs=args.eval_save_model_every_epochs,
        eval_every_opti_steps=args.eval_save_model_every_opti_steps,
        precise_first_n_epochs=args.precise_first_n_epochs,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        resume_from_checkpoint=args.resume_from_checkpoint,
        mixed_precision=args.mixed_precision,
        remat=args.remat,
        metrics_flush_every=args.metrics_flush_every,
        upload_uint8=args.upload_uint8,
        model_parallel=args.model_parallel,
        compute_metrics=args.compute_fid or args.compute_isc or args.compute_kid,
        train=TrainConfig(
            proba_uncond=args.proba_uncond,
            ema=EMAConfig(
                inv_gamma=args.ema_inv_gamma,
                power=args.ema_power,
                max_decay=args.ema_max_decay,
            ),
            optimizer=OptimizerConfig(
                learning_rate=args.learning_rate,
                adam_beta1=args.adam_beta1,
                adam_beta2=args.adam_beta2,
                adam_weight_decay=args.adam_weight_decay,
                adam_epsilon=args.adam_epsilon,
                max_grad_norm=args.max_grad_norm,
                lr_scheduler=args.lr_scheduler,
                lr_warmup_steps=args.lr_warmup_steps,
                total_steps=args.max_num_steps or 100_000,
                moment_dtype=args.adam_moment_dtype,
            ),
        ),
        eval=EvalConfig(
            nb_generated_images=args.nb_generated_images,
            eval_batch_size=args.eval_batch_size,
            num_inference_steps=args.num_inference_steps,
            guidance_factor=args.guidance_factor,
            main_metric=MAIN_METRIC_NAMES[args.main_metric],
            metrics=MetricsConfig(
                fid=args.compute_fid,
                isc=args.compute_isc,
                kid=args.compute_kid,
                kid_subset_size=args.kid_subset_size,
            ),
            unconditional=args.proba_uncond >= 1.0,
        ),
        tracker=args.tracker,
    )


def main(argv=None):
    from phendiff_tpu.cli import force_platform_from_env, setup_compilation_cache

    force_platform_from_env()
    setup_compilation_cache()
    args = build_parser().parse_args(argv)
    # debug downscaling first: it sets an eval cadence and shrinks
    # nb_generated_images, both of which check_args validates
    if args.debug:
        modify_args_for_debug(args)
    warnings = check_args(args)
    banner(args, warnings)

    policy = Policy.from_mixed_precision(args.mixed_precision)
    pipeline = load_initial_pipeline(args, dtype=policy.compute_jnp)
    paths = RunPaths.create(
        args.exp_output_dirs_parent_folder, args.experiment_name, args.run_name
    )
    config = trainer_config_from_args(args)
    if isinstance(pipeline, ConditionalDDIMPipeline):
        trainer = for_ddim_pipeline(
            pipeline, config, paths,
            attention_fine_tuning=args.attention_fine_tuning,
        )
    else:
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(
            pipeline.unet_params))
        full_width = n_params > 200_000_000
        use_segmented = args.segmented_sd == "on"
        copy_params = True
        if args.segmented_sd == "auto" and full_width:
            # Full width: prefer the MONOLITHIC one-program step (13.5x
            # faster than the per-stage chain on the r4 tunnel: 198 ms vs
            # 2.68 s @128px b32) — but only if the backend's compile
            # transport takes the 866M-param HLO; r2/r3 tunnels rejected
            # it (broken pipe), hence the segmented fallback.  The probe
            # lowers from abstract inputs, so a failure allocates nothing.
            from phendiff_tpu.train.trainer import probe_sd_monolithic_compile

            config.remat = True  # full-width backward does not fit unremat
            use_segmented = not probe_sd_monolithic_compile(pipeline, config)
            if not use_segmented:
                # adopt (don't copy) the 3.5 GB param tree; the pipeline
                # object's arrays are consumed by the donating step
                copy_params = False
        if use_segmented:
            # full-width fallback route: per-stage programs + per-stage-VJP
            # training (models/sd_segmented.py)
            if "autoencoder" in args.components_to_train:
                raise NotImplementedError(
                    "training the VAE ('autoencoder') is not supported on "
                    "the segmented route (its per-stage VJP chain covers "
                    "the UNet + class embedding); use --segmented_sd off "
                    "for the monolithic route, which trains it"
                )
            if args.model_parallel > 1:
                raise NotImplementedError(
                    "--model_parallel > 1 is not supported on the segmented "
                    "route (per-stage single-chip programs); use "
                    "--segmented_sd off for the monolithic TP path"
                )
            from phendiff_tpu.train.segmented_trainer import SegmentedSDTrainer

            import jax.numpy as jnp

            clip_mode, cache_dtype = {
                "recompute": ("recompute", None),
                "cache": ("cache", None),
                "cache_bf16": ("cache", jnp.bfloat16),
            }[args.segmented_clip_mode]
            seg_trainer = SegmentedSDTrainer(
                pipeline, config, paths,
                components_to_train=tuple(args.components_to_train),
                attention_fine_tuning=args.attention_fine_tuning,
                clip_mode=clip_mode, cache_dtype=cache_dtype,
            )
            out = seg_trainer.run()
            print(f"done: {int(out['step'])} steps; best "
                  f"{config.eval.main_metric} = {seg_trainer.best_metric}")
            return 0
        trainer = for_sd_pipeline(
            pipeline, config, paths,
            components_to_train=tuple(args.components_to_train),
            attention_fine_tuning=args.attention_fine_tuning,
            copy_params=copy_params,
        )
    state = trainer.run()
    print(f"done: {int(state.step)} steps; best {config.eval.main_metric} = "
          f"{trainer.best_metric}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
