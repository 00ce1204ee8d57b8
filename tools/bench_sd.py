"""Full-width SD-2.1 UNet on the attached TPU: forward + DDIB latent transfer.

Round 1 could not get the 866M-param program through the dev tunnel's
remote-compile transport (docs/BENCHMARKS.md).  Round 2's compact
attention layouts shrank the HLO by an order of magnitude — this measures
whether the full model now compiles, and if so its throughput at 512px
(64x64 latents).

Usage: python tools/bench_sd.py [fwd|transfer]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from phendiff_tpu.core import SchedulerConfig, make_schedule
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.obs.profiling import force_sync

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
LAT = int(os.environ.get("BENCH_LAT", "64"))  # 64 latents = 512px
STEPS = int(os.environ.get("BENCH_STEPS", "50"))


def build():
    cfg = SDUNetConfig(sample_size=LAT)
    model = SDUNet(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, LAT, LAT, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    seq = jnp.zeros((1, 77, cfg.cross_attention_dim))
    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.key(0), x, t, seq)
    force_sync(params)
    n = sum(p.size for p in jax.tree.leaves(params))
    print(f"# init: {n/1e6:.1f}M params in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    return cfg, model, params


def bench_segmented(cfg, params, mode):
    """Segmented execution: ~11 small per-stage programs instead of one
    monolithic HLO (which breaks the dev tunnel's compile transport)."""
    import numpy as np

    from phendiff_tpu.core import scheduler as S
    from phendiff_tpu.models.embeddings import pad_to_clip_sequence
    from phendiff_tpu.models.sd_segmented import SegmentedSDUNet

    seg = SegmentedSDUNet(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (BATCH, LAT, LAT, 4))
    t = jnp.full((BATCH,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (BATCH, 77, 1024)) * 0.02

    t0 = time.perf_counter()
    out = seg(params, x, t, ctx)
    force_sync(out)
    print(f"# segmented compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    if mode == "seg":
        # dependency-chain the iterations and materialize the result —
        # independent dispatches measured only queueing time on the
        # remote-attached device (1.1 ms "forwards" that never waited)
        iters = 10
        t0 = time.perf_counter()
        xc = x
        for _ in range(iters):
            xc = xc + 0.0 * seg(params, xc, t, ctx)
        float(xc.sum())
        dt = (time.perf_counter() - t0) / iters
        print({"sd_seg_fwd_ms": round(dt*1e3, 1), "batch": BATCH,
               "latent": LAT, "denoise_steps_per_sec": round(BATCH/dt, 2),
               "px": LAT*8})
        return

    # segmented DDIB transfer: the host-driven step loop from the transfer
    # API (numerics identical to the single-scan ddib — tested)
    from phendiff_tpu.pipelines.transfer import ddib_stepwise

    schedule = S.make_schedule(S.SchedulerConfig(
        num_train_timesteps=1000, timestep_spacing="trailing",
        clip_sample=False))
    emb = jax.random.normal(jax.random.key(3), (2, 1024)) * 0.02
    src = pad_to_clip_sequence(jnp.tile(emb[0][None], (BATCH, 1)))
    tgt = pad_to_clip_sequence(jnp.tile(emb[1][None], (BATCH, 1)))

    def one_transfer(xc):
        return ddib_stepwise(
            lambda x, t, e: seg(params, x, t, e), schedule, xc, src, tgt,
            num_inference_steps=STEPS,
        )

    out = one_transfer(x)
    force_sync(out)  # warm
    t0 = time.perf_counter()
    out = one_transfer(x)
    force_sync(out)
    dt = time.perf_counter() - t0
    assert bool(jnp.isfinite(out).all())
    print({"sd_latent_transfers_per_sec_per_chip": round(BATCH/dt, 3),
           "batch": BATCH, "latent": LAT, "px": LAT*8, "steps": STEPS,
           "denoise_steps_per_sec": round(BATCH*2*STEPS/dt, 1),
           "segmented": True})


def bench_segtrain(seg, params):
    """Full-width SD fine-tune step on hardware (per-stage VJP training).

    Reference workload: SD-2.1 UNet + class-embedding fine-tune over frozen
    VAE latents, epsilon MSE (launch_script_SD.sh: batch 64/GPU at 128px)."""
    import optax

    from phendiff_tpu.core import scheduler as Sc
    from phendiff_tpu.models.embeddings import pad_to_clip_sequence
    from phendiff_tpu.train.segmented_train import SegmentedSDTrainStep

    schedule = Sc.make_schedule(Sc.SchedulerConfig(num_train_timesteps=1000))
    step = SegmentedSDTrainStep(seg, schedule, optax.adamw(1e-5))
    opt_state = step.init_opt_state(params)
    force_sync(opt_state)
    lat = jax.random.normal(jax.random.key(1), (BATCH, LAT, LAT, 4))
    emb = jax.random.normal(jax.random.key(2), (BATCH, 1024)) * 0.02
    ctx = pad_to_clip_sequence(emb)

    t0 = time.perf_counter()
    params, opt_state, _, m = step(params, opt_state, lat, ctx, jax.random.key(3), donate=True)
    loss0 = float(m["loss"])
    print(f"# segtrain compile+first: {time.perf_counter()-t0:.1f}s "
          f"loss={loss0:.4f}", file=sys.stderr)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, _, m = step(
            params, opt_state, lat, ctx, jax.random.key(4 + i), donate=True
        )
    loss = float(m["loss"])  # materializes the chain
    dt = (time.perf_counter() - t0) / iters
    print({"sd_segtrain_step_ms": round(dt * 1e3, 1), "batch": BATCH,
           "latent": LAT, "px": LAT * 8,
           "samples_per_sec_per_chip": round(BATCH / dt, 2),
           "loss": round(loss, 4), "loss_first": round(loss0, 4)})


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    if mode == "segtrain":
        from phendiff_tpu.models.sd_segmented import SegmentedSDUNet

        cfg = SDUNetConfig(sample_size=LAT)
        seg = SegmentedSDUNet(cfg, dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        params = seg.init(
            jax.random.key(0), jnp.zeros((1, LAT, LAT, cfg.in_channels)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
        )
        force_sync(params)
        print(f"# init {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        return bench_segtrain(seg, params)
    if mode in ("seg", "segtransfer"):
        from phendiff_tpu.models.sd_segmented import SegmentedSDUNet

        cfg = SDUNetConfig(sample_size=LAT)
        seg = SegmentedSDUNet(cfg, dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        params = seg.init(
            jax.random.key(0), jnp.zeros((1, LAT, LAT, cfg.in_channels)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
        )
        force_sync(params)
        n = sum(p.size for p in jax.tree.leaves(params))
        print(f"# segmented init: {n/1e6:.1f}M params in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        return bench_segmented(cfg, params, mode)
    cfg, model, params = build()
    x = jax.random.normal(jax.random.key(1), (BATCH, LAT, LAT, 4))
    t = jnp.full((BATCH,), 500, jnp.int32)
    seq = jax.random.normal(jax.random.key(2), (BATCH, 77, 1024)) * 0.02

    if mode == "fwd":
        f = jax.jit(lambda x, t, s: model.apply(params, x, t, s))
        t0 = time.perf_counter()
        c = f.lower(x, t, seq).compile()
        print(f"# forward compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", 0) if ca else 0
        out = c(x, t, seq); force_sync(out)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = c(x, t, seq)
        force_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print({"sd_fwd_ms": round(dt*1e3, 1), "batch": BATCH,
               "latent": LAT, "tflops_per_sec": round(flops/dt/1e12, 1),
               "denoise_steps_per_sec": round(BATCH/dt, 2)})
    else:
        from phendiff_tpu.pipelines import transfer as T

        schedule = make_schedule(SchedulerConfig(
            num_train_timesteps=1000, timestep_spacing="trailing",
            clip_sample=False))
        emb = jax.random.normal(jax.random.key(3), (2, 1024)) * 0.02
        from phendiff_tpu.models.embeddings import pad_to_clip_sequence
        src = pad_to_clip_sequence(jnp.tile(emb[0][None], (BATCH, 1)))
        tgt = pad_to_clip_sequence(jnp.tile(emb[1][None], (BATCH, 1)))

        def denoiser(xx, tt, class_seq):
            return model.apply(params, xx, tt, class_seq)

        f = jax.jit(lambda im: T.ddib(
            denoiser, schedule, im, src, tgt, num_inference_steps=STEPS))
        t0 = time.perf_counter()
        c = f.lower(x).compile()
        print(f"# transfer compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        out = c(x); force_sync(out)
        t0 = time.perf_counter()
        iters = 2
        for _ in range(iters):
            out = c(x)
        force_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print({"sd_latent_transfers_per_sec_per_chip": round(BATCH/dt, 3),
               "batch": BATCH, "latent": LAT, "steps": STEPS,
               "denoise_steps_per_sec": round(BATCH*2*STEPS/dt, 1)})


if __name__ == "__main__":
    main()
