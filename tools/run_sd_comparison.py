"""Full-width SD img2img comparison experiment ON HARDWARE at 512px.

Drives the comparison engine (VERDICT r2 #6's bar) with the segmented
route auto-selected: loads a saved full-width SDImg2ImgPipeline folder
(e.g. the ``full_pipeline_save`` of tools/train_sd_full.py), runs the
ddib + classifier_free_guidance_forward_start methods over a 512px toy
split, and records the output tree + metrics.json.  Matches the
reference's SD-as-first-class-pipeline comparison app
(``img2img_comparison.py:100,136-155``) at a width its torch stack needs
an A100-80GB for.

Usage: python tools/run_sd_comparison.py --pipeline <folder>
       [--workdir /tmp/phendiff_sd_comparison] [--res 512] [--batch 8]
       [--steps 50] [--n_per_class 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", required=True,
                    help="saved SDImg2ImgPipeline folder (full width)")
    ap.add_argument("--workdir", default="/tmp/phendiff_sd_comparison")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--n_per_class", type=int, default=8)
    args = ap.parse_args()

    from phendiff_tpu.experiments.comparison import (
        ComparisonConfig,
        ComparisonExperiment,
        MethodParams,
    )
    from phendiff_tpu.metrics.fidelity import MetricsConfig

    data_dir = os.path.join(args.workdir, f"data{args.res}")
    if not os.path.isdir(data_dir):
        os.system(
            f"{sys.executable} {os.path.dirname(__file__)}/make_toy_dataset.py "
            f"{data_dir} --n {args.n_per_class} --res {args.res}"
        )

    methods = ("ddib", "classifier_free_guidance_forward_start")
    out_dir = os.path.join(args.workdir, "out")
    cfg = ComparisonConfig(
        output_dir=out_dir,
        pipelines={"sd_full": args.pipeline},
        dataset_train=data_dir,
        definition=(args.res, args.res),
        methods=methods,
        method_params={m: MethodParams(batch_size=args.batch) for m in methods},
        num_inference_steps=args.steps,
        metrics=MetricsConfig(fid=True, isc=False, kid=False),
        # AUTO: above the param threshold the monolithic compile is probed
        # per method — this tunnel takes the 866M HLO (r4), so the
        # one-program scan route is expected; segmented is the fallback.
        segmented_sd=None,
    )
    t0 = time.perf_counter()
    exp = ComparisonExperiment(cfg)
    n_params = sum(
        int(p.size) for p in jax.tree.leaves(exp.pipes["sd_full"].unet_params)
    )
    seg = exp._use_segmented(
        exp.pipes["sd_full"], methods[0], cfg.method_params[methods[0]]
    )
    print(f"# pipeline loaded: {n_params/1e6:.1f}M UNet params, "
          f"segmented={seg} ({time.perf_counter()-t0:.1f}s)", file=sys.stderr)

    t0 = time.perf_counter()
    exp.run_transfers()
    t_transfers = time.perf_counter() - t0
    t0 = time.perf_counter()
    metrics = exp.compute_metrics()
    t_metrics = time.perf_counter() - t0

    tree = []
    for root, _dirs, files in os.walk(out_dir):
        for f in sorted(files):
            tree.append(os.path.relpath(os.path.join(root, f), out_dir))
    n_images = sum(1 for f in tree if f.endswith(".png") and "_to_" in f)
    print(json.dumps({
        "metric": f"sd_full_width_comparison_{args.res}px",
        "methods": list(methods),
        "n_transferred_images": n_images,
        "transfer_sec": round(t_transfers, 1),
        "transfers_per_sec": round(n_images / t_transfers, 3),
        "metrics_sec": round(t_metrics, 1),
        "segmented": True,
        "metrics_keys": sorted(metrics.keys()),
        "fid_pooled": {
            k: round(v, 3) for k, v in metrics.items()
            if k.count("/") == 3 and k.endswith("frechet_inception_distance")
        },
        "output_tree_sample": tree[:12],
    }))


if __name__ == "__main__":
    main()
