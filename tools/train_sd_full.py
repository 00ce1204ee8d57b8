"""FULL-WIDTH SD-2.1 fine-tune as a REAL training run on the attached TPU.

The round-2 capability was a step primitive; this drives
``SegmentedSDTrainer`` end-to-end on hardware (VERDICT r2 #2's bar):
≥50 optimization steps at full 866M width with a decreasing loss curve,
global grad clipping at 1.0, class-embedding training, EMA, an Orbax
checkpoint written mid-run, an exact resume continuing from it, and an
EMA-weighted eval producing a sample panel.

The VAE is random-init (no pretrained weights exist in this zero-egress
image — models/hf_import.py converts real ones when available); that
changes the latent distribution, not the training mechanics being
demonstrated.  Reference workload: ``launch_script_SD.sh`` (SD-2.1 UNet +
class embedding over frozen VAE, 128px, batch 64/GPU on A100-80GB).

Usage: python tools/train_sd_full.py [--res 128] [--batch 32]
       [--steps 50] [--workdir /tmp/phendiff_sd_full]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--resume_extra", type=int, default=10)
    ap.add_argument("--workdir", default="/tmp/phendiff_sd_full")
    ap.add_argument("--clip_mode", default="recompute")
    ap.add_argument(
        "--resume_only", action="store_true",
        help="skip the initial run; restore 'latest' and continue "
        "resume_extra steps (for rerunning an interrupted resume phase)",
    )
    args = ap.parse_args()

    from phendiff_tpu.core import SchedulerConfig
    from phendiff_tpu.metrics.fidelity import MetricsConfig
    from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
    from phendiff_tpu.models.sd_unet import SDUNetConfig
    from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline
    from phendiff_tpu.train.eval_loop import EvalConfig
    from phendiff_tpu.train.segmented_trainer import SegmentedSDTrainer
    from phendiff_tpu.train.train_loop import OptimizerConfig, TrainConfig
    from phendiff_tpu.train.trainer import RunPaths, TrainerConfig

    data_dir = os.path.join(args.workdir, "data")
    if not os.path.isdir(data_dir):
        from tools.make_toy_dataset import main as _  # noqa: F401  (import check)
        os.system(
            f"{sys.executable} {os.path.dirname(__file__)}/make_toy_dataset.py "
            f"{data_dir} --n 64 --res {args.res}"
        )

    lat = args.res // 8
    unet_cfg = SDUNetConfig(sample_size=lat)  # FULL SD-2.1 width
    vae_cfg = AutoencoderKLConfig()  # full SD VAE (f8, 4 latent channels)
    sched = SchedulerConfig(num_train_timesteps=1000)

    print("# initializing full-width pipeline (segmented init)...",
          file=sys.stderr)
    t0 = time.perf_counter()
    # segmented init for the UNet (monolithic init HLO breaks the compile
    # transport); VAE + embedding init monolithically (small programs)
    from phendiff_tpu.models.autoencoder_kl import AutoencoderKL
    from phendiff_tpu.models.embeddings import ClassEmbedding
    from phendiff_tpu.models.sd_segmented import SegmentedSDUNet

    seg = SegmentedSDUNet(unet_cfg, dtype=jnp.bfloat16)
    if args.resume_only:
        # the trainer restores everything from ABSTRACT shapes on resume —
        # materializing 866M throwaway params here would waste minutes and
        # half the chip's HBM
        unet_params = None
    else:
        unet_params = seg.init(
            jax.random.key(0), jnp.zeros((1, lat, lat, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
        )
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    vae_params = jax.jit(vae.init)(
        jax.random.key(1), jnp.zeros((1, args.res, args.res, 3))
    )
    ce_params = ClassEmbedding(2, 1024).init(jax.random.key(2), jnp.array([0]))
    n = sum(p.size for p in jax.tree.leaves(unet_params))
    print(f"# init done: {n/1e6:.1f}M UNet params in "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    pipe = SDImg2ImgPipeline(
        unet_cfg, vae_cfg, sched, 2, 1024,
        unet_params, vae_params, ce_params, dtype=jnp.bfloat16,
    )

    paths = RunPaths.create(args.workdir, "sd_full", "run0")
    config = TrainerConfig(
        train_data_dir=data_dir,
        definition=(args.res, args.res),
        train_batch_size=args.batch,
        num_epochs=1000,
        max_train_steps=args.steps,
        eval_every_epochs=None,
        eval_every_opti_steps=args.steps,  # one eval at the end
        checkpointing_steps=args.steps // 2,
        checkpoints_total_limit=1,
        mixed_precision="bf16",
        compute_metrics=True,
        train=TrainConfig(
            proba_uncond=0.1,
            optimizer=OptimizerConfig(learning_rate=1e-5, max_grad_norm=1.0),
        ),
        eval=EvalConfig(
            nb_generated_images=8, eval_batch_size=8, num_inference_steps=10,
            metrics=MetricsConfig(fid=True, isc=False, kid=False),
        ),
        tracker="jsonl",
    )
    if not args.resume_only:
        trainer = SegmentedSDTrainer(
            pipe, config, paths, clip_mode=args.clip_mode, seg=seg,
            copy_params=False,  # a second 3.5 GB param tree won't fit on 16 GB
        )
        # drop every other reference to the adopted param buffers so donation
        # actually frees them (the pipeline object stays config+VAE-only)
        pipe.unet_params = None
        pipe.class_embedding_params = None
        del unet_params, ce_params
        print(f"# steps/epoch={len(trainer.loader)}; training {args.steps} "
              f"steps @ {args.res}px batch {args.batch} "
              f"clip_mode={args.clip_mode}", file=sys.stderr)
        t0 = time.perf_counter()
        trainer.run()
        dt = time.perf_counter() - t0
        # free the first trainer's 13.8 GB state before the restore allocates
        # its own (resume restores from ABSTRACT shapes — no throwaway init)
        del trainer
        import gc

        gc.collect()
    else:
        # the phase-1 run already happened in a prior process; the throwaway
        # init above only provided shapes for the restore.  Free it.
        pipe.unet_params = None
        pipe.class_embedding_params = None
        del unet_params, ce_params
        import gc

        gc.collect()
        dt = None

    with open(os.path.join(paths.run_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f if "loss" in l]
    recs = [r for r in recs if r.get("step", 0) <= args.steps]
    losses = [r["loss"] for r in recs if "loss" in r]
    if dt is None:  # reconstruct phase-1 wall time from the logged step times
        dt = len(losses) * recs[-1]["perf/step_time_s"]
    first5, last5 = float(np.mean(losses[:5])), float(np.mean(losses[-5:]))
    print(f"# {len(losses)} steps in {dt:.1f}s; loss {losses[0]:.4f} -> "
          f"{losses[-1]:.4f} (first5 {first5:.4f} vs last5 {last5:.4f})",
          file=sys.stderr)

    # ---- exact resume: continue for resume_extra steps --------------------
    config2 = type(config)(**{**config.__dict__,
                              "max_train_steps": args.steps + args.resume_extra,
                              "resume_from_checkpoint": "latest",
                              "compute_metrics": False})
    trainer2 = SegmentedSDTrainer(
        pipe, config2, paths, clip_mode=args.clip_mode, seg=seg,
    )
    t0 = time.perf_counter()
    trainer2.run()
    print(f"# resume: continued to step {trainer2.global_step} "
          f"in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    if not (os.path.isdir(paths.full_pipeline_save)
            and os.listdir(paths.full_pipeline_save)):
        print("# saving EMA pipeline for downstream comparison runs...",
              file=sys.stderr)
        trainer2.save_pipeline(paths.full_pipeline_save)

    panel_dirs = sorted((paths.run_dir + "/images/" + d)
                        for d in os.listdir(os.path.join(paths.run_dir, "images")))
    result = {
        "metric": f"sd_full_width_finetune_{args.res}px",
        "steps": len(losses),
        "sec_per_step": round(dt / max(len(losses), 1), 3),
        "samples_per_sec_per_chip": round(args.batch * len(losses) / dt, 2),
        "loss_first5": round(first5, 4),
        "loss_last5": round(last5, 4),
        "loss_decreased": last5 < first5,
        "checkpoint_steps": [int(s) for s in trainer2.ckpt.all_steps()],
        "resumed_to_step": trainer2.global_step,
        "eval_panels": panel_dirs[-1] if panel_dirs else None,
        "clip_mode": args.clip_mode,
        "grad_norm_last": recs[-1].get("grad_norm"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
