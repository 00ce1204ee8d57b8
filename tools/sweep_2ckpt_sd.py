"""Full-width 2-checkpoint comparison sweep ON HARDWARE (milestone 5).

The reference sweeps img2img comparisons across checkpoints by relaunching
its comparison app per config point (``img2img_comparison_launcher.py:69-99``
+ ``examples/example_sweep_configs/CFG_sweep.yaml``); each checkpoint swap
is free because torch modules are data.  Here the analogous guarantee is
the comparison engine's per-ARCHITECTURE program cache (params ride through
jit as traced arguments, ``experiments/comparison.py``): N same-architecture
checkpoints share ONE compiled transfer program per method.

This tool produces the hardware evidence for that claim at the full 866M
SD-2.1 width (VERDICT r4 #5 "docs show a full-width 2-checkpoint sweep on
hardware"):

1. builds TWO full-width checkpoints on disk (random init + a perturbed
   copy — same architecture, different weights),
2. builds a toy 2-class imagefolder,
3. runs the REAL product path — ``python -m phendiff_tpu.cli.img2img_cli``
   with a 2-pipeline YAML — on the attached TPU,
4. reports per-checkpoint transfer wall time (from the engine's
   ``timings.json``): checkpoint B must run at batch speed, paying no
   second compile, and outputs/metrics must differ between checkpoints.

Usage:
    python tools/sweep_2ckpt_sd.py [--res 128] [--steps 20] [--batch 8]
                                   [--images-per-class 16] [--workdir /tmp/sweep2]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "tpu")


def build_checkpoints(workdir: str, res: int) -> tuple:
    from phendiff_tpu.cli import force_platform_from_env

    # env alone does not beat this host's sitecustomize plugin priority;
    # config.update before backend init does (tests/conftest.py note)
    force_platform_from_env()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from phendiff_tpu.core import SchedulerConfig
    from phendiff_tpu.models.autoencoder_kl import AutoencoderKLConfig
    from phendiff_tpu.models.sd_unet import SDUNetConfig
    from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline

    latent = res // 8
    t0 = time.perf_counter()
    pipe = SDImg2ImgPipeline.init_random(
        SDUNetConfig(sample_size=latent),
        AutoencoderKLConfig(sample_size=res),
        SchedulerConfig(num_train_timesteps=1000, clip_sample=False,
                        timestep_spacing="trailing"),
        num_classes=2, class_embedding_dim=1024, seed=0,
    )
    n = sum(p.size for p in jax.tree.leaves(pipe.unet_params))
    print(f"# init full-width pipeline ({n/1e6:.0f}M unet params): "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    ckpt_a = os.path.join(workdir, "ckptA")
    ckpt_b = os.path.join(workdir, "ckptB")
    t0 = time.perf_counter()
    pipe.save_pretrained(ckpt_a)
    # checkpoint B: same architecture, genuinely different weights — a
    # deterministic multiplicative perturbation of every floating leaf
    key = jax.random.key(1)
    leaves, treedef = jax.tree.flatten(pipe.unet_params)
    keys = jax.random.split(key, len(leaves))
    leaves_b = [
        l * (1.0 + 0.05 * jax.random.normal(k, l.shape, l.dtype))
        if jnp.issubdtype(l.dtype, jnp.floating) else l
        for l, k in zip(leaves, keys)
    ]
    pipe_b = pipe.replace_params(unet_params=jax.tree.unflatten(treedef, leaves_b))
    pipe_b.save_pretrained(ckpt_b)
    print(f"# saved 2 checkpoints: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    return ckpt_a, ckpt_b


def build_dataset(workdir: str, res: int, per_class: int) -> str:
    import numpy as np
    from PIL import Image

    root = os.path.join(workdir, "data")
    rng = np.random.default_rng(0)
    for cls in ("healthy", "treated"):
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = (rng.random((res, res, 3)) * 255).astype("uint8")
            Image.fromarray(arr).save(os.path.join(d, f"img_{i:03d}.png"))
    return root


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--images-per-class", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/sweep2")
    ap.add_argument("--phase", default="orchestrate",
                    choices=("orchestrate", "build"))
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    if args.phase == "build":
        # child phase: owns the chip only for init+save, then exits
        build_checkpoints(args.workdir, args.res)
        build_dataset(args.workdir, args.res, args.images_per_class)
        return 0

    # orchestrator: NEVER touches jax — the chip admits one client at a
    # time (the jax-free bench.py parent exists for the same reason), so
    # each device-owning phase runs in its own process
    build_env = dict(os.environ)
    build_env["JAX_PLATFORMS"] = "cpu"  # init+save needs no chip
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", "build",
         "--res", str(args.res), "--workdir", args.workdir,
         "--images-per-class", str(args.images_per_class)],
        env=build_env,
    ).returncode
    if rc != 0:
        print(f"# build phase failed rc={rc}", file=sys.stderr)
        return rc
    ckpt_a = os.path.join(args.workdir, "ckptA")
    ckpt_b = os.path.join(args.workdir, "ckptB")
    data = os.path.join(args.workdir, "data")

    out_dir = os.path.join(args.workdir, "out")
    config = {
        "output_dir": out_dir,
        "pipelines": {"ckptA": ckpt_a, "ckptB": ckpt_b},
        "dataset_train": data,
        "definition": [args.res, args.res],
        "methods": ["ddib"],
        "method_params": {"ddib": {"batch_size": args.batch}},
        "num_inference_steps": args.steps,
        "metrics": {"fid": True, "isc": True, "kid": False},
    }
    cfg_path = os.path.join(args.workdir, "sweep2.yaml")
    import yaml

    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    # the REAL product entry point, fresh process (honest compile story)
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "tpu")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "phendiff_tpu.cli.img2img_cli",
         "--config", cfg_path],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    cli_wall = time.perf_counter() - t0
    sys.stderr.write(proc.stderr[-8000:])
    if proc.returncode != 0:
        print(f"# CLI failed rc={proc.returncode}", file=sys.stderr)
        sys.stdout.write(proc.stdout[-4000:])
        return proc.returncode

    with open(os.path.join(out_dir, "timings.json")) as f:
        timings = json.load(f)
    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    # did the two checkpoints actually produce different transfers?
    fid_a = metrics.get("ddib/ckptA/train/fid")
    fid_b = metrics.get("ddib/ckptB/train/fid")
    compile_lines = [
        ln for ln in proc.stderr.splitlines()
        if "transfer compiles at full width" in ln
    ]
    result = {
        "metric": "sweep_2ckpt_fullwidth",
        "cli_wall_s": round(cli_wall, 1),
        "timings": timings,
        "ckptA_wall_s": timings["ddib/ckptA"]["wall_s"],
        "ckptB_wall_s": timings["ddib/ckptB"]["wall_s"],
        "compile_log_lines": len(compile_lines),
        "fid_ckptA": fid_a,
        "fid_ckptB": fid_b,
        "fids_differ": (fid_a is not None and fid_b is not None
                        and abs(fid_a - fid_b) > 1e-6),
        "steps": args.steps,
        "batch": args.batch,
        "res": args.res,
        "images": 2 * args.images_per_class,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
