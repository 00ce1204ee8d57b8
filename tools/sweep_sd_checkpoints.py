"""N-checkpoint img2img comparison SWEEP at full SD-2.1 width ON HARDWARE.

BASELINE milestone 5 / VERDICT r4 #5: the reference sweeps a comparison
experiment across checkpoints by swapping state dicts into one torch
graph (``img2img_comparison_launcher.py:69-99`` drives
``img2img_comparison.py:100`` with per-run Hydra overrides).  Here the
same sweep is ONE compiled transfer program per (architecture, method):
checkpoints ride through jit as traced arguments, so checkpoint 2..N pay
zero compile (``experiments/comparison.py`` `_transfer_fns` cache, keyed
by ``arch_fingerprint()``).

This tool makes the sweep measurable end-to-end at full width:

1. creates (or reuses) N full-width SDImg2ImgPipeline checkpoint folders
   (random-init, distinct seeds — this image has no egress to download
   trained SD weights; architecture identical so fingerprints match);
2. runs the comparison engine over ALL of them in one config
   (``pipelines={ck0: ..., ck1: ...}``) with per-checkpoint wall timing;
3. asserts exactly ONE transfer program was compiled for the whole sweep
   and that the checkpoints produced divergent outputs;
4. emits the per-checkpoint metric table (the reference's wandb sweep
   analog) + timing provenance as one JSON line.

Usage: python tools/sweep_sd_checkpoints.py [--n_ckpts 2] [--res 128]
           [--batch 8] [--steps 10] [--n_per_class 4]
           [--workdir /tmp/phendiff_sd_sweep]
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_ckpts", type=int, default=2)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--n_per_class", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/phendiff_sd_sweep")
    args = ap.parse_args()
    lat = args.res // 8

    from phendiff_tpu.core import SchedulerConfig
    from phendiff_tpu.experiments.comparison import (
        ComparisonConfig, ComparisonExperiment, MethodParams,
    )
    from phendiff_tpu.metrics.fidelity import MetricsConfig
    from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
    from phendiff_tpu.models.sd_unet import SDUNetConfig
    from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline

    # -- 1. checkpoint folders (reused across runs: save once) -------------
    ckpt_dirs = {}
    t0 = time.perf_counter()
    for i in range(args.n_ckpts):
        d = os.path.join(args.workdir, f"ck{i}_res{args.res}")
        ckpt_dirs[f"ck{i}"] = d
        if os.path.isfile(os.path.join(d, "model_index.json")):
            continue
        pipe = SDImg2ImgPipeline.init_random(
            SDUNetConfig(sample_size=lat),      # FULL SD-2.1 width (866M)
            AutoencoderKLConfig(),              # full SD VAE
            SchedulerConfig(num_train_timesteps=1000,
                            timestep_spacing="trailing",
                            clip_sample=False),
            num_classes=2, class_embedding_dim=1024, seed=100 + i,
        )
        pipe.save_pretrained(d)
        del pipe
    t_ckpts = time.perf_counter() - t0

    data_dir = os.path.join(args.workdir, f"data{args.res}")
    if not os.path.isdir(data_dir):
        os.system(
            f"{sys.executable} {os.path.dirname(__file__)}/make_toy_dataset.py "
            f"{data_dir} --n {args.n_per_class} --res {args.res}"
        )

    # -- 2. one config, N checkpoints ---------------------------------------
    out_dir = os.path.join(args.workdir, "out")
    cfg = ComparisonConfig(
        output_dir=out_dir,
        pipelines=ckpt_dirs,
        dataset_train=data_dir,
        definition=(args.res, args.res),
        methods=("ddib",),
        method_params={"ddib": MethodParams(batch_size=args.batch)},
        num_inference_steps=args.steps,
        metrics=MetricsConfig(fid=True, isc=False, kid=False),
        segmented_sd=False,  # the monolithic one-program route (r4)
    )
    t0 = time.perf_counter()
    exp = ComparisonExperiment(cfg)
    t_load = time.perf_counter() - t0

    # per-checkpoint wall timing: drive the same cached program per pipe
    # (run_transfers iterates method->pipe; we time each pipe by running
    # the engine on single-pipe views that SHARE the _transfer_fns cache)
    per_ckpt_s = {}
    all_pipes = dict(exp.pipes)
    for name in ckpt_dirs:
        exp.pipes = {name: all_pipes[name]}
        t0 = time.perf_counter()
        exp.run_transfers()
        per_ckpt_s[name] = round(time.perf_counter() - t0, 2)
    exp.pipes = all_pipes

    # -- 3. sweep invariants -------------------------------------------------
    n_programs = len(exp._transfer_fns)
    if n_programs != 1:
        raise RuntimeError(
            f"sweep compiled {n_programs} transfer programs; the "
            f"arch-fingerprint cache should have produced exactly 1"
        )
    # checkpoints must actually differ: compare first transferred image
    firsts = []
    for name in ckpt_dirs:
        d = os.path.join(out_dir, "ddib", name, "train")
        pngs = sorted(f for f in os.listdir(d) if "_to_" in f)
        from PIL import Image

        with Image.open(os.path.join(d, pngs[0])) as im:
            firsts.append(np.asarray(im).astype(int))
    max_diff = max(
        int(np.abs(firsts[0] - f).max()) for f in firsts[1:]
    )
    if max_diff == 0:
        raise RuntimeError(
            "distinct checkpoints produced identical outputs — the traced "
            "params are not reaching the compiled program"
        )

    # -- 4. per-checkpoint metric table (the wandb-sweep analog) ------------
    t0 = time.perf_counter()
    metrics = exp.compute_metrics()
    t_metrics = time.perf_counter() - t0
    table = {
        k: round(float(v), 4)
        for k, v in metrics.items()
        if k.endswith("frechet_inception_distance") and k.count("/") == 3
    }

    print(json.dumps({
        "metric": f"sd_checkpoint_sweep_{args.res}px_{args.steps}step",
        "n_ckpts": args.n_ckpts,
        "transfer_programs_compiled": n_programs,
        "per_ckpt_transfer_s": per_ckpt_s,
        "ckpt_prep_s": round(t_ckpts, 1),
        "pipeline_load_s": round(t_load, 1),
        "metrics_s": round(t_metrics, 1),
        "outputs_diverge_max_px": max_diff,
        "fid_table": table,
        "inception_pretrained": float(getattr(exp.extractor, "pretrained", True)),
    }))


if __name__ == "__main__":
    main()
