"""Diagnose the full-width segmented-train RUN LOOP on hardware.

VERDICT r3 #2: the real run did 1.69 s/step vs ~0.27 s for the bare step
primitive, and the resumed segment's step time crept 1.18→1.95 s over 10
steps.  This tool runs the REAL SegmentedSDTrainer loop on synthetic
imagefolder data and prints, per step: wall time, the host-phase split
(t_data / t_dispatch / t_await from the trainer's own instrumentation),
host RSS, and device memory stats — enough to tell a host-side creep
(leak, queue) from a device-side one (fragmentation) and to locate the
1.4 s/step of non-step time.

Usage (on the TPU):
    python tools/profile_sd_train.py --steps 30 --batch 32 [--width full]
    python tools/profile_sd_train.py --steps 30 --resume   # creep repro

``--width tiny`` (default) runs a reduced-width SD config for quick
plumbing checks on CPU; ``--width full`` is the real SD-2.1 866M config
(only sensible on the chip).
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np


def make_data(root: str, n: int, px: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n // 2):
            Image.fromarray(
                rng.integers(0, 255, (px, px, 3), dtype=np.uint8)
            ).save(os.path.join(d, f"{i}.png"))


def _build_seg(args, pipe, cfg, paths):
    import jax.numpy as jnp

    from phendiff_tpu.train.segmented_trainer import SegmentedSDTrainer

    cache_dtype = jnp.bfloat16 if args.cache_dtype == "bf16" else None
    trainer = SegmentedSDTrainer(
        pipe, cfg, paths, clip_mode=args.clip_mode,
        copy_params=args.width != "full",
    )
    if cache_dtype is not None:
        # rebuild the step with the bf16 cache (trainer arg plumbing keeps
        # the constructor small; this tool pokes the knob directly)
        trainer.step_fn.cache_dtype = cache_dtype
        trainer.step_fn._to_cache = jax.jit(
            lambda g: jax.tree.map(lambda x: x.astype(cache_dtype), g)
        )
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--px", type=int, default=128)
    ap.add_argument("--width", choices=("tiny", "full"), default="tiny")
    ap.add_argument("--route", choices=("seg", "mono"), default="seg",
                    help="'mono' drives the standard Trainer with the "
                         "one-program monolithic step (r4: compiles on the "
                         "tunnel, 13.5x the segmented chain); 'seg' drives "
                         "SegmentedSDTrainer")
    ap.add_argument("--clip_mode", default="recompute")
    ap.add_argument("--cache_dtype", default=None, choices=(None, "bf16"))
    ap.add_argument("--resume", action="store_true",
                    help="checkpoint mid-run, restore, continue (creep repro)")
    ap.add_argument("--data", default="/tmp/phendiff_prof_data")
    ap.add_argument("--out", default="/tmp/phendiff_prof_run")
    ap.add_argument("--trace_at", type=int, default=0,
                    help="capture an xplane trace for 2 steps at this step")
    ap.add_argument("--flush_every", type=int, default=1,
                    help="mono route: materialize metrics every N steps "
                         "(one stacked fetch — removes the ~30 ms tunnel "
                         "round trip from the per-step critical path)")
    ap.add_argument("--upload_uint8", action="store_true",
                    help="ship batches as uint8, normalize on device "
                         "(4x fewer host→device bytes)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from phendiff_tpu.core import SchedulerConfig
    from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
    from phendiff_tpu.models.sd_unet import SDUNetConfig
    from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline
    from phendiff_tpu.train.trainer import RunPaths, TrainerConfig
    from phendiff_tpu.train.train_loop import OptimizerConfig, TrainConfig

    n_images = max(args.batch * 8, 64)
    if not os.path.isdir(args.data) or not os.listdir(args.data):
        make_data(args.data, n_images, args.px)

    if args.width == "full":
        unet_cfg = SDUNetConfig(sample_size=args.px // 8)
        vae_cfg = AutoencoderKLConfig(sample_size=args.px)
        ce_dim = 1024
    else:
        unet_cfg = SDUNetConfig(
            sample_size=args.px // 8,
            block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1,
            cross_attention_dim=32,
            attention_head_dim=(4, 8),
            norm_num_groups=8,
        )
        vae_cfg = AutoencoderKLConfig(
            block_out_channels=(16, 32, 32, 32), layers_per_block=1,
            norm_num_groups=8, latent_channels=4, sample_size=args.px,
        )
        ce_dim = 32

    pipe = SDImg2ImgPipeline.init_random(
        unet_cfg, vae_cfg,
        SchedulerConfig(num_train_timesteps=1000),
        num_classes=2, class_embedding_dim=ce_dim, seed=0,
    )
    paths = RunPaths.create(args.out, "prof", "run0")
    cfg = TrainerConfig(
        train_data_dir=args.data,
        definition=(args.px, args.px),
        train_batch_size=args.batch,
        num_epochs=10_000,  # bounded by max_train_steps
        max_train_steps=args.steps,
        eval_every_epochs=None,
        checkpointing_steps=(args.steps // 2) if args.resume else 10**9,
        mixed_precision="bf16",
        compute_metrics=False,
        save_final_checkpoint=False,  # 14 GB over the tunnel ≈ 80 min
        metrics_flush_every=args.flush_every,
        upload_uint8=args.upload_uint8,
        train=TrainConfig(
            proba_uncond=0.1,
            optimizer=OptimizerConfig(learning_rate=1e-5, total_steps=10_000),
        ),
        tracker="jsonl",
    )
    if args.route == "mono":
        from phendiff_tpu.train.trainer import for_sd_pipeline

        if args.width == "full":
            cfg.remat = True  # full-width backward does not fit unremat
        trainer = for_sd_pipeline(
            pipe, cfg, paths, copy_params=args.width != "full"
        )
    else:
        trainer = _build_seg(args, pipe, cfg, paths)

    if args.trace_at:
        orig_flush = trainer._flush_metrics
        state = {"on": False}

        def flush_with_trace(pending, timer):
            # seg route: pending = (step, ...); mono route: list of records
            if pending and isinstance(pending, list):
                pending_step = pending[0][0]
            elif pending:
                pending_step = pending[0]
            else:
                pending_step = None
            if pending_step == args.trace_at and not state["on"]:
                jax.profiler.start_trace("/tmp/phendiff_trace_sd_train")
                state["on"] = True
            elif pending_step == args.trace_at + 2 and state["on"]:
                jax.profiler.stop_trace()
                state["on"] = False
                print("# trace written to /tmp/phendiff_trace_sd_train",
                      file=sys.stderr)
            orig_flush(pending, timer)

        trainer._flush_metrics = flush_with_trace

    t0 = time.perf_counter()
    trainer.run()
    wall = time.perf_counter() - t0

    # replay the metrics log with RSS at analysis time
    recs = []
    with open(os.path.join(paths.run_dir, "metrics.jsonl")) as f:
        for line in f:
            recs.append(json.loads(line))
    print(f"# total wall {wall:.1f}s for {args.steps} steps "
          f"({args.batch * args.steps / wall:.1f} samples/s incl. compile)")
    print("step  step_time  t_data  t_dispatch  t_await  loss")
    for r in recs:
        m = r.get("metrics", r)
        print(f"{r.get('step', '?'):>4}  "
              f"{m.get('perf/step_time_s', float('nan')):9.3f}  "
              f"{m.get('perf/t_data_s', float('nan')):6.3f}  "
              f"{m.get('perf/t_dispatch_s', float('nan')):10.3f}  "
              f"{m.get('perf/t_await_s', float('nan')):7.3f}  "
              f"{m.get('loss', float('nan')):8.4f}")
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    tail = [r.get("metrics", r).get("perf/step_time_s") for r in recs[-10:]]
    tail = [t for t in tail if t]
    print(f"# peak host RSS {rss_gb:.2f} GB; last-10 step times "
          f"{min(tail):.3f}..{max(tail):.3f}s "
          f"({'FLAT' if tail and max(tail) / max(min(tail), 1e-9) < 1.15 else 'CREEPING'})")


if __name__ == "__main__":
    main()
