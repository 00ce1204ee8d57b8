"""Reconstruction-error parity harness (the north-star numerics check).

Mirrors the reference's built-in correctness probe — the
``inverted_regeneration`` transfer method plus its Gaussianity diagnostics
(``utils_Img2Img.py:79-93, 374-384``; figures
``saved_figures/reco_err_{samples,latents}.png``): sample images from a
pipeline, DDIM-invert them, check the latents are ~N(0,1), regenerate with
the same class, and report per-image reconstruction error.

Usage:
    python tools/reco_err.py [--pipeline DIR] [--steps 50] [--batch 8]
    # no --pipeline → a fixed-seed random super_small model at --res

Prints one JSON line with reco-error statistics; exits nonzero if the
round trip fails the relative-error threshold.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pipeline", default=None, help="pretrained pipeline dir")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--threshold", type=float, default=0.05,
                   help="max allowed mean relative reconstruction error")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from phendiff_tpu.core import SchedulerConfig
    from phendiff_tpu.models import config as C
    from phendiff_tpu.pipelines import ConditionalDDIMPipeline
    from phendiff_tpu.pipelines.transfer import check_gaussianity

    if args.pipeline:
        pipe = ConditionalDDIMPipeline.from_pretrained(args.pipeline)
    else:
        pipe = ConditionalDDIMPipeline.init_random(
            C.super_small().replace(sample_size=args.res),
            SchedulerConfig(clip_sample=False, timestep_spacing="trailing"),
            seed=0,
        )

    n_cls = pipe.num_classes or 2
    labels = jnp.arange(args.batch, dtype=jnp.int32) % n_cls

    @jax.jit
    def round_trip(rng):
        x = pipe.generate(labels, rng, num_inference_steps=args.steps)
        z = pipe.invert(x, labels, num_inference_steps=args.steps)
        recon = pipe.generate(
            labels, rng, start_image=z, num_inference_steps=args.steps
        )
        return x, z, recon

    x, z, recon = round_trip(jax.random.key(0))
    err = np.asarray(
        jnp.mean((recon - x) ** 2, axis=(1, 2, 3))
        / jnp.maximum(jnp.mean(x**2, axis=(1, 2, 3)), 1e-8)
    )
    gauss = {k: float(v) for k, v in check_gaussianity(z).items()}
    result = {
        "metric": "inversion_reco_rel_err",
        "mean": float(err.mean()),
        "max": float(err.max()),
        "latent_stats": gauss,
        "steps": args.steps,
        "batch": args.batch,
        "pass": bool(err.mean() < args.threshold),
    }
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
