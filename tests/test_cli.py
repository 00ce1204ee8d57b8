"""CLI surface tests: arg parsing, invariants, debug mode, factory dispatch,
end-to-end train CLI smoke, img2img comparison app."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from phendiff_tpu.cli import args as A
from phendiff_tpu.cli.factory import load_initial_pipeline, override_scheduler_config
from phendiff_tpu.core import SchedulerConfig
from phendiff_tpu.models import UNet2DConfig
from phendiff_tpu.pipelines import ConditionalDDIMPipeline


def parse(extra):
    base = [
        "--run_name", "t", "--model_type", "DDIM",
        "--train_data_dir", "/tmp/x",
        "--denoiser_config_path", "/tmp/d.json",
        "--eval_save_model_every_epochs", "1",
    ]
    return A.build_parser().parse_args(base + extra)


def test_definition_parsing():
    assert A.parse_definition("128") == (128, 128)
    assert A.parse_definition("64,96") == (64, 96)


def test_args_defaults_and_checker():
    args = parse([])
    warnings = A.check_args(args)
    assert isinstance(warnings, list)
    assert args.class_embedding_dim == 1024  # reference default
    assert args.ema_power == 0.75


def test_checker_rejects_grad_accum():
    args = parse(["--gradient_accumulation_steps", "2"])
    with pytest.raises(ValueError):
        A.check_args(args)


def test_checker_rejects_bad_components():
    args = parse([])
    args.components_to_train = ["autoencoder"]
    with pytest.raises(ValueError):
        A.check_args(args)


def test_checker_requires_model_source():
    args = parse([])
    args.denoiser_config_path = None
    with pytest.raises(ValueError):
        A.check_args(args)


def test_checker_requires_data_source():
    """args_checker :80-84: dataset_name or train_data_dir."""
    args = parse([])
    args.train_data_dir = None
    with pytest.raises(ValueError, match="dataset name"):
        A.check_args(args)
    args.dataset_name = "/some/hf/dataset"
    A.check_args(args)  # ok now


def test_checker_requires_eval_cadence():
    """args_checker :184-188: an eval cadence is mandatory."""
    args = parse([])
    args.eval_save_model_every_epochs = None
    with pytest.raises(ValueError, match="eval_save_model"):
        A.check_args(args)


def test_checker_kid_subset_invariant():
    """args_checker :115-123: nb_generated >= kid_subset unless debug."""
    args = parse(["--compute_kid", "--nb_generated_images", "100",
                  "--kid_subset_size", "1000"])
    with pytest.raises(ValueError, match="kid_subset_size"):
        A.check_args(args)
    args.debug = True
    A.check_args(args)  # debug mode shrinks both later


def test_checker_pretrained_config_exclusive():
    """args_checker :146-157: pretrained xor denoiser config, unless
    learning the denoiser from scratch."""
    args = parse(["--pretrained_model_name_or_path", "/some/pipe"])
    with pytest.raises(ValueError, match="pretrained"):
        A.check_args(args)
    args.learn_denoiser_from_scratch = True
    A.check_args(args)  # allowed: config overrides the reinit architecture


def test_checker_unconditional():
    """args_checker :97-109: proba_uncond==1 semantics."""
    args = parse(["--proba_uncond", "1.0"])
    w = A.check_args(args)
    assert any("unconditionally" in x for x in w)
    args = parse(["--proba_uncond", "1.0", "--guidance_factor", "5.0"])
    with pytest.raises(ValueError, match="unconditional"):
        A.check_args(args)


def test_checker_perc_samples_range():
    args = parse(["--perc_samples", "0"])
    with pytest.raises(ValueError, match="perc_samples"):
        A.check_args(args)


def test_torch_mechanics_flags_accepted_with_warnings():
    """Reference launch scripts keep working: torch/accelerate flags parse
    and warn instead of erroring."""
    args = parse([
        "--dataloader_num_workers", "8", "--pin_memory", "--local_rank", "0",
        "--push_to_hub", "--hub_model_id", "x/y", "--revision", "fp16",
        "--use_pytorch_loader",
    ])
    w = A.check_args(args)
    joined = " ".join(w)
    assert "dataloader_num_workers" in joined
    assert "pin_memory" in joined
    assert "zero-egress" in joined
    assert "--revision" in joined


def test_logger_flag_maps_to_tracker():
    args = parse(["--logger", "wandb"])
    w = A.check_args(args)
    assert args.tracker == "wandb"
    assert any("--logger wandb" in x for x in w)


def test_reference_alias_flags():
    """--experiment_name/--project and --max_num_epochs/--num_epochs."""
    args = parse(["--experiment_name", "expA", "--max_num_epochs", "7"])
    assert args.experiment_name == "expA" and args.num_epochs == 7
    args = parse(["--project", "expB", "--num_epochs", "9"])
    assert args.experiment_name == "expB" and args.num_epochs == 9


def test_debug_downscaling():
    args = parse(["--debug"])
    A.modify_args_for_debug(args)
    assert args.num_train_timesteps == 10
    assert args.num_inference_steps == 5
    assert args.max_num_steps == 30
    assert args.checkpointing_steps == 10


def test_scheduler_override_precedence(tmp_path):
    base = SchedulerConfig(num_train_timesteps=1000, prediction_type="epsilon")
    jpath = tmp_path / "s.json"
    jpath.write_text(json.dumps(
        {"num_train_timesteps": 500, "prediction_type": "v_prediction"}
    ))

    class FakeArgs:
        prediction_type = "sample"
        num_train_timesteps = None
        beta_start = None
        beta_end = None
        beta_schedule = None

    # file overrides base; CL overrides file
    out = override_scheduler_config(base, FakeArgs(), str(jpath))
    assert out.num_train_timesteps == 500  # from file
    assert out.prediction_type == "sample"  # from CL


def test_factory_ddim_from_config(tmp_path):
    cfg = UNet2DConfig(
        sample_size=16, block_out_channels=(8, 8),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4, num_class_embeds=2,
    )
    dpath = tmp_path / "d.json"
    dpath.write_text(json.dumps(cfg.to_json_dict()))
    args = parse([])
    args.denoiser_config_path = str(dpath)
    args.definition = (16, 16)
    pipe = load_initial_pipeline(args)
    assert isinstance(pipe, ConditionalDDIMPipeline)
    assert pipe.unet_config.sample_size == 16


def test_train_cli_end_to_end(tiny_image_root, tmp_path):
    """Full debug-scale training run through the CLI (the reference's
    --debug smoke-test pattern, SURVEY.md §4)."""
    from phendiff_tpu.cli.train_cli import main

    cfg = UNet2DConfig(
        sample_size=16, block_out_channels=(8, 8),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4, num_class_embeds=2,
    )
    dpath = tmp_path / "denoiser.json"
    dpath.write_text(json.dumps(cfg.to_json_dict()))
    rc = main([
        "--run_name", "smoke",
        "--model_type", "DDIM",
        "--train_data_dir", str(tiny_image_root),
        "--denoiser_config_path", str(dpath),
        "--definition", "16",
        "--train_batch_size", "8",
        "--eval_batch_size", "4",
        "--nb_generated_images", "4",
        "--no_compute_fid",
        "--exp_output_dirs_parent_folder", str(tmp_path / "exp"),
        "--mixed_precision", "no",
        "--debug",
    ])
    assert rc == 0
    run_dir = tmp_path / "exp" / "phendiff-tpu" / "smoke"
    assert (run_dir / "metrics.jsonl").exists()
    assert (run_dir / "checkpoints").is_dir()


def test_img2img_cli_end_to_end(tiny_image_root, tmp_path):
    """Train-free comparison run: random pipeline, ddib + reconstruction."""
    from phendiff_tpu.cli.img2img_cli import main as cmp_main

    pipe = ConditionalDDIMPipeline.init_random(
        UNet2DConfig(
            sample_size=16, block_out_channels=(8, 8),
            down_block_types=("DownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "UpBlock2D"),
            layers_per_block=1, norm_num_groups=4, num_class_embeds=2,
        ),
        SchedulerConfig(num_train_timesteps=20, clip_sample=False),
    )
    pipe_dir = tmp_path / "pipe"
    pipe.save_pretrained(str(pipe_dir))

    conf = {
        "output_dir": str(tmp_path / "cmp_out"),
        "pipelines": {"ddim": str(pipe_dir)},
        "dataset_train": str(tiny_image_root),
        "definition": [16, 16],
        "methods": ["ddib", "inverted_regeneration"],
        "method_params": {"ddib": {"batch_size": 8}},
        "num_inference_steps": 4,
        "metrics": {"fid": True, "isc": False, "kid": False},
    }
    cpath = tmp_path / "conf.yaml"
    cpath.write_text(yaml.safe_dump(conf))
    rc = cmp_main(["--config", str(cpath), "--debug"])
    assert rc == 0
    out = tmp_path / "cmp_out"
    assert (out / "frozen_config.yaml").exists()
    assert (out / "metrics.json").exists()
    # output naming: method/pipe/split/target_class/<stem>_to_<class>.png
    ddib_dir = out / "ddib" / "ddim" / "train"
    pngs = list(ddib_dir.rglob("*_to_*.png"))
    assert pngs, "no transfer outputs written"
    metrics = json.loads((out / "metrics.json").read_text())
    assert any("frechet_inception_distance" in k for k in metrics)