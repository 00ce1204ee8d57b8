"""Benchmark: the BASELINE.md milestone metrics, ONE JSON line — always.

Architecture (VERDICT r3 #1: the round-3 artifact was lost to a one-shot
tunnel flake, so the harness itself must be un-losable):

* The PARENT (default entry) never imports jax.  It probes backend
  acquisition in bounded subprocesses (retry loop — a dead tunnel exits in
  minutes with a clear message instead of hanging in the PJRT plugin's
  retry sleep), then runs every section as its own watchdogged child
  process, persists each successful section to ``BENCH_LAST_GOOD.json``,
  and ALWAYS prints exactly one JSON line: fresh numbers when captured,
  last-good numbers marked ``"stale": true`` plus an ``"error"`` field
  when a section (or the whole tunnel) is down.  Exit code is 0 whenever
  a JSON line was produced.
* A CHILD (``BENCH_CHILD=1``) runs one section in-process and prints that
  section's JSON (the pre-r4 behavior).

Sections = the driver-visible milestone numbers (VERDICT r2 #7 + r3 #2):

1. **transfer** (headline) — img2img class transfers/sec/chip: 50-step
   DDIM inversion + 50-step regeneration at 128px on the super_small
   conditional UNet;
2. **train** — train samples/sec/chip on the same config (AdamW+EMA+CFG
   dropout);
3. **sd128** — full-width SD-2.1 segmented DDIB latent transfer @128px
   (the reference's SD-ddib config, batch_size/a100-80gb.yaml:8);
4. **sd512** — the same @512px (BASELINE.md milestone 4 resolution);
5. **sdtrain** — full-width SD-2.1 segmented fine-tune step @128px with
   the real run's semantics (EMA, global clip, donation);
with MFU for each (algorithmic XLA-reported FLOPs over the chip's bf16
peak).

``vs_baseline`` compares against an *estimated* A100 throughput for the
reference implementation, since the reference publishes no numbers
(BASELINE.md): we take the XLA-reported algorithmic FLOPs of one transfer
and assume the reference sustains 40% of A100's 312 TFLOP/s fp16 peak.
This deliberately over-credits the baseline: the architecture's 8-dim
attention heads cannot reach 40% utilization on tensor-core hardware
(materialized torch attention measured at ~11% of peak when we ran the
equivalent XLA program on v5e), so treat vs_baseline as a conservative
lower bound.  The BASELINE.json target (≥5x A100) assumes v5p-8 hardware;
this chip is a single v5e-lite with 63% of one A100's peak FLOPs.

Set BENCH_MODE=transfer|train|sd128|sd512|sdtrain to run one section
alone (parent still wraps it in the probe + watchdog + last-good logic).
"""

import json
import os
import subprocess
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
RES = int(os.environ.get("BENCH_RES", "128"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
MODE = os.environ.get("BENCH_MODE", "combined")
# Lane-packed execution of the narrow-channel levels (r3; exact numerics,
# tests/test_lane_pack.py).  Default on; set 0 for the r2 baseline.
LANE_PACK = os.environ.get("BENCH_LANE_PACK", "1") == "1"
A100_PEAK_FLOPS = 312e12
A100_ASSUMED_UTILIZATION = 0.40
# bf16 peak of the attached chip (v5e-lite), for MFU reporting (progress
# tracked against hardware, not only against the estimated-A100 line).
CHIP_PEAK_FLOPS = float(os.environ.get("BENCH_CHIP_PEAK_FLOPS", 197e12))

# Ordered by information value under a tight deadline (VERDICT r4 #1c):
# sdtrain first (the one number never captured clean), then the SD
# inference milestones, then the flagship pair.  The parent re-prints the
# combined JSON line after EVERY completed section, so an external kill
# loses at most the in-flight section — never the artifact.
SECTIONS = ("sdtrain", "sd128", "transfer", "train", "sd512")
# A capture taken while the host is busy (e.g. the CPU test suite) is not
# comparable: flag it and never let it displace a clean last-good entry
# (VERDICT r4 weak #5).  1-min load average above this = contended.
CONTENTION_LOAD = float(os.environ.get("BENCH_CONTENTION_LOAD", "2.0"))
LAST_GOOD_PATH = os.environ.get(
    "BENCH_LAST_GOOD", os.path.join(os.path.dirname(__file__) or ".",
                                    "BENCH_LAST_GOOD.json")
)
# Generous per-section watchdogs: first compiles over the tunnel take
# minutes (cached afterwards), but a hung backend must die in bounded time.
WATCHDOG = {
    "transfer": int(os.environ.get("BENCH_WATCHDOG_TRANSFER", 1500)),
    "train": int(os.environ.get("BENCH_WATCHDOG_TRAIN", 1500)),
    "sd128": int(os.environ.get("BENCH_WATCHDOG_SD128", 2400)),
    "sd512": int(os.environ.get("BENCH_WATCHDOG_SD512", 3000)),
    "sdtrain": int(os.environ.get("BENCH_WATCHDOG_SDTRAIN", 3000)),
}


# ---------------------------------------------------------------------------
# Child: one section in-process (imports jax)
# ---------------------------------------------------------------------------

def _child_setup():
    plat = os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax

    # The env var alone is NOT authoritative on machines whose sitecustomize
    # registers + re-prioritizes the axon PJRT plugin in every process
    # (tests/conftest.py has the same note): the config update below runs
    # before backend init and wins.
    jax.config.update("jax_platforms", plat)
    # Remote compiles over the tunnel take minutes; cache them across runs.
    jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return jax


def _force(*arrays):
    """Reliable execution barrier for timing.

    On the attached tunnel runtime, ``block_until_ready`` returns BEFORE
    the device has executed the dispatched programs (measured r4: a
    137-GFLOP matmul "completed" in 0.12 ms → 1174 TFLOPS on a 197-TFLOP
    chip; a forced host fetch of the same chain gave 98.7 TFLOPS, i.e. a
    plausible 50% MFU).  Fetching data to the host is the only observed
    true barrier, so every timed section syncs by pulling ONE element of
    each result to the host — the gather depends on the full producing
    computation, so this forces execution without paying a bulk transfer.
    """
    import numpy as np

    for a in arrays:
        if getattr(a, "ndim", 0) == 0 or a.size <= 64:
            np.asarray(a)
        else:
            np.asarray(a.ravel()[:1])


def bench_train():
    """Training-step throughput (samples/s/chip) on the flagship config.

    Comparable fact from the reference: 112 images/GPU at 128px fp16 fit an
    A100 for from-scratch DDIM training (BASELINE.md); throughput itself is
    unpublished."""
    jax = _child_setup()
    import jax.numpy as jnp

    from phendiff_tpu.core import SchedulerConfig, make_schedule
    from phendiff_tpu.models import CondUNet2D
    from phendiff_tpu.models import config as C
    from phendiff_tpu.train.train_loop import (
        OptimizerConfig, TrainConfig, init_train_state, make_optimizer,
        make_train_step,
    )

    cfg = C.super_small().replace(sample_size=RES)
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    model = CondUNet2D(cfg, dtype=jnp.bfloat16, remat=remat, lane_pack=LANE_PACK)
    x = jnp.zeros((1, RES, RES, 3))
    params = model.init(
        jax.random.key(0), x, jnp.array([0]), class_labels=jnp.array([0])
    )
    model_apply = lambda p, xx, t, ce: model.apply(p, xx, t, class_emb=ce)
    embed_fn = lambda p, l: p["params"]["class_embedding"]["embedding"][l]
    schedule = make_schedule(SchedulerConfig())
    tcfg = TrainConfig(proba_uncond=0.1, optimizer=OptimizerConfig())
    opt = make_optimizer(tcfg.optimizer)
    step = jax.jit(
        make_train_step(model_apply, embed_fn, schedule, tcfg, opt),
        donate_argnums=(0,),
    )
    state = init_train_state(params, opt)
    images = jax.random.normal(jax.random.key(1), (BATCH, RES, RES, 3)) * 0.5
    labels = jnp.tile(jnp.array([0, 1]), BATCH // 2)

    t0 = time.perf_counter()
    compiled = step.lower(state, (images, labels), jax.random.key(2)).compile()
    cost = compiled.cost_analysis()
    ca = cost[0] if isinstance(cost, (list, tuple)) else cost
    step_flops = ca.get("flops") if ca else None
    state, m = compiled(state, (images, labels), jax.random.key(2))
    _force(m["loss"])
    print(f"# train compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = compiled(state, (images, labels), jax.random.key(2))
    # loss depends on the PREVIOUS iter's applied params, so forcing it
    # covers iters 1..N-1 fully; forcing one param leaf covers the final
    # iter's backward+apply as well
    _force(m["loss"], jax.tree.leaves(state)[0])
    dt = time.perf_counter() - t0
    sustained = step_flops * iters / dt if step_flops else None
    return {
        "metric": f"train_samples_per_sec_per_chip_{RES}px",
        "value": round(BATCH * iters / dt, 2),
        "unit": "samples/s/chip",
        "vs_baseline": None,
        "batch": BATCH,
        "device": str(jax.devices()[0]),
        "loss": float(m["loss"]),
        "tflops_per_sec": round(sustained / 1e12, 1) if sustained else None,
        "mfu": round(sustained / CHIP_PEAK_FLOPS, 3) if sustained else None,
    }


def bench_transfer():
    jax = _child_setup()
    import jax.numpy as jnp

    from phendiff_tpu.core import SchedulerConfig, make_schedule
    from phendiff_tpu.models import CondUNet2D
    from phendiff_tpu.models import config as C
    from phendiff_tpu.pipelines import transfer as T

    dev = jax.devices()[0]
    cfg = C.super_small().replace(sample_size=RES)
    model = CondUNet2D(cfg, dtype=jnp.bfloat16, lane_pack=LANE_PACK)
    x = jnp.zeros((BATCH, RES, RES, 3), dtype=jnp.float32)
    params = model.init(
        jax.random.key(0), x[:1], jnp.array([0]), class_labels=jnp.array([0])
    )
    schedule = make_schedule(
        SchedulerConfig(num_train_timesteps=1000, timestep_spacing="trailing",
                        clip_sample=False)
    )

    def denoiser(xx, t, class_emb):
        return model.apply(params, xx, t, class_emb=class_emb)

    table = params["params"]["class_embedding"]["embedding"]
    src = jnp.tile(table[0][None], (BATCH, 1))
    tgt = jnp.tile(table[1][None], (BATCH, 1))

    @jax.jit
    def transfer(images):
        return T.ddib(
            denoiser, schedule, images, src, tgt, num_inference_steps=STEPS
        )

    images = jax.random.normal(jax.random.key(1), (BATCH, RES, RES, 3)) * 0.5

    t_c0 = time.perf_counter()
    compiled = transfer.lower(images).compile()
    print(f"# compile: {time.perf_counter() - t_c0:.1f}s", file=sys.stderr)

    # Per-forward FLOPs from the scan program's own cost analysis: XLA
    # reports the (single, fused) scan body once, i.e. ≈ one batched UNet
    # forward.  One transfer = 2*STEPS forwards.  (Avoids compiling a
    # second program over the slow tunnel.)
    cost = compiled.cost_analysis()
    ca = cost[0] if isinstance(cost, (list, tuple)) else cost
    fwd_flops = ca.get("flops") if ca else None
    flops_per_call = 2 * STEPS * fwd_flops if fwd_flops else None

    # warmup run (reuse the compiled executable — do NOT re-trigger jit)
    out = compiled(images)
    _force(out)

    # dependency-chain the iterations: the attached runtime can drop
    # dispatched computations whose outputs die unobserved, which makes
    # independent-call loops measure queueing instead of execution
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    x = images
    for _ in range(iters):
        x = 0.999 * x + 1e-3 * compiled(x)
    _force(x)
    dt = time.perf_counter() - t0

    transfers_per_sec = BATCH * iters / dt

    vs_baseline = float("nan")
    if flops_per_call:
        flops_per_transfer = flops_per_call / BATCH
        a100_est = (A100_PEAK_FLOPS * A100_ASSUMED_UTILIZATION) / flops_per_transfer
        vs_baseline = transfers_per_sec / a100_est

    sustained = (
        transfers_per_sec * flops_per_call / BATCH if flops_per_call else None
    )
    return {
        "metric": f"img2img_transfers_per_sec_per_chip_{STEPS}step_{RES}px",
        "value": round(transfers_per_sec, 3),
        "unit": "transfers/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline == vs_baseline else None,
        "batch": BATCH,
        "device": str(dev),
        "denoise_steps_per_sec": round(transfers_per_sec * 2 * STEPS, 1),
        "flops_per_transfer": flops_per_call / BATCH if flops_per_call else None,
        # Algorithmic (unpadded) FLOPs/s over the chip's bf16 peak.  The
        # architecture's D=8 attention heads cap achievable MFU well below
        # 1.0: the MXU contracts 128 lanes per pass, so each attention
        # matmul does 8/128 useful work — see docs/BENCHMARKS.md roofline.
        "tflops_per_sec": round(sustained / 1e12, 1) if sustained else None,
        "mfu": round(sustained / CHIP_PEAK_FLOPS, 3) if sustained else None,
    }


def bench_sd(latent: int, batch: int, steps: int = 50):
    """Full-width SD-2.1 DDIB latent transfer (milestones 3-4).

    Route mirrors the comparison engine's auto-routing: the MONOLITHIC
    one-program ``lax.scan`` bridge first (the r4 tunnel compiles the 866M
    HLO), the host-driven segmented per-stage chain as fallback for
    transports that reject it.  Set BENCH_SD_ROUTE=seg to force the
    fallback measurement.  Params are zeros of the right shapes
    (throughput on MXU/VPU is data-independent; a real init costs ~6 min
    of device RNG over the tunnel and changes nothing about timing)."""
    route = os.environ.get("BENCH_SD_ROUTE", "mono")
    if route == "mono":
        try:
            return _bench_sd_mono(latent, batch, steps)
        except Exception as e:
            print(f"# sd{latent * 8} monolithic failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); falling back to segmented",
                  file=sys.stderr)
    return _bench_sd_seg(latent, batch, steps)


def _bench_sd_mono(latent: int, batch: int, steps: int):
    jax = _child_setup()
    import jax.numpy as jnp

    from phendiff_tpu.models.embeddings import pad_to_clip_sequence
    from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
    from phendiff_tpu.core import SchedulerConfig, make_schedule
    from phendiff_tpu.pipelines import transfer as T

    cfg = SDUNetConfig(sample_size=latent)
    model = SDUNet(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, latent, latent, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
    )
    # bf16 STORAGE for inference params (the comparison engine's
    # inference_param_dtype default).  Measured r5 at b64/128px:
    # throughput-NEUTRAL (27.99 bf16 vs 27.95 f32 transfers/s — the scan
    # is compute-bound at this batch, not weight-bound), but it halves
    # the resident weight footprint (1.7 GB vs 3.5 GB) and matches the
    # reference's unconditional fp16 autocast.  BENCH_SD_PARAM_DTYPE=
    # float32 reproduces the f32-storage variant.
    pdt = getattr(jnp, os.environ.get("BENCH_SD_PARAM_DTYPE", "bfloat16"))
    params = jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, pdt if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype
        ),
        shapes,
    )
    n = sum(p.size for p in jax.tree.leaves(params))

    x = jax.random.normal(jax.random.key(1), (batch, latent, latent, 4))
    emb = jax.random.normal(jax.random.key(3), (2, 1024)) * 0.02
    src = pad_to_clip_sequence(jnp.tile(emb[0][None], (batch, 1)))
    tgt = pad_to_clip_sequence(jnp.tile(emb[1][None], (batch, 1)))

    schedule = make_schedule(SchedulerConfig(
        num_train_timesteps=1000, timestep_spacing="trailing",
        clip_sample=False))

    # params are a TRACED ARGUMENT, not a closure capture: capturing the
    # 3.5 GB tree bakes it into the HLO as constants (the MLIR warning in
    # the r3/r4 runs), which was most of the 6-9 min compile cost
    # (VERDICT r4 #2); as an argument the same program also serves any
    # other checkpoint of this architecture.
    @jax.jit
    def one_transfer(p, xc):
        return T.ddib(lambda xx, tt, e: model.apply(p, xx, tt, e),
                      schedule, xc, src, tgt, num_inference_steps=steps)

    t0 = time.perf_counter()
    compiled = one_transfer.lower(params, x).compile()
    print(f"# sd{latent * 8} monolithic compile: "
          f"{time.perf_counter() - t0:.1f}s ({n / 1e6:.0f}M params, "
          f"params-as-args)", file=sys.stderr)
    # XLA reports the fused scan body once ≈ one batched UNet forward
    # (same convention as bench_transfer); one transfer = 2*steps fwd.
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    fwd_flops = ca.get("flops") if ca else None

    out = compiled(params, x)
    _force(out)  # warm
    t0 = time.perf_counter()
    out = compiled(params, out)  # chain on the warm output: no dedup
    _force(out)
    dt = time.perf_counter() - t0
    if not bool(jnp.isfinite(out).all()):
        raise RuntimeError("non-finite sd transfer output")
    tps = batch / dt
    sustained = tps * 2 * steps * fwd_flops / batch if fwd_flops else None
    return {
        "metric": f"sd_latent_transfers_per_sec_per_chip_{steps}step_{latent * 8}px",
        "value": round(tps, 3),
        "unit": "transfers/s/chip",
        "batch": batch,
        "latent": latent,
        "route": "monolithic",
        "denoise_steps_per_sec": round(tps * 2 * steps, 1),
        "tflops_per_sec": round(sustained / 1e12, 1) if sustained else None,
        "mfu": round(sustained / CHIP_PEAK_FLOPS, 3) if sustained else None,
    }


def _bench_sd_seg(latent: int, batch: int, steps: int = 50):
    jax = _child_setup()
    import jax.numpy as jnp

    from phendiff_tpu.models.embeddings import pad_to_clip_sequence
    from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
    from phendiff_tpu.models.sd_unet import SDUNetConfig
    from phendiff_tpu.core import SchedulerConfig, make_schedule
    from phendiff_tpu.pipelines.transfer import ddib_stepwise

    cfg = SDUNetConfig(sample_size=latent)
    seg = SegmentedSDUNet(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        seg.init, jax.random.key(0),
        jnp.zeros((1, latent, latent, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
    )
    # bf16 storage, same rationale as _bench_sd_mono
    pdt = getattr(jnp, os.environ.get("BENCH_SD_PARAM_DTYPE", "bfloat16"))
    params = jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, pdt if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype
        ),
        shapes,
    )
    n = sum(p.size for p in jax.tree.leaves(params))

    x = jax.random.normal(jax.random.key(1), (batch, latent, latent, 4))
    t = jnp.full((batch,), 500, jnp.int32)
    emb = jax.random.normal(jax.random.key(3), (2, 1024)) * 0.02
    src = pad_to_clip_sequence(jnp.tile(emb[0][None], (batch, 1)))
    tgt = pad_to_clip_sequence(jnp.tile(emb[1][None], (batch, 1)))

    t0 = time.perf_counter()
    fwd_flops = seg.cost_flops(params, x, t, src)
    print(f"# sd{latent * 8} stage compiles: {time.perf_counter() - t0:.1f}s "
          f"({n / 1e6:.0f}M params, {fwd_flops / 1e12:.2f} TFLOP/fwd)",
          file=sys.stderr)

    schedule = make_schedule(SchedulerConfig(
        num_train_timesteps=1000, timestep_spacing="trailing",
        clip_sample=False))

    def one_transfer(xc):
        return ddib_stepwise(
            lambda xx, tt, e: seg(params, xx, tt, e), schedule, xc, src, tgt,
            num_inference_steps=steps,
        )

    out = one_transfer(x)
    _force(out)  # warm (stage programs already compiled above)
    t0 = time.perf_counter()
    out = one_transfer(out)  # chain on the warm output: no reused-input dedup
    _force(out)
    dt = time.perf_counter() - t0
    tps = batch / dt
    sustained = tps * 2 * steps * fwd_flops / batch if fwd_flops else None
    return {
        "metric": f"sd_latent_transfers_per_sec_per_chip_{steps}step_{latent * 8}px",
        "value": round(tps, 3),
        "unit": "transfers/s/chip",
        "batch": batch,
        "latent": latent,
        "segmented": True,
        "denoise_steps_per_sec": round(tps * 2 * steps, 1),
        "tflops_per_sec": round(sustained / 1e12, 1) if sustained else None,
        "mfu": round(sustained / CHIP_PEAK_FLOPS, 3) if sustained else None,
    }


def bench_sd_train(latent: int = 16, batch: int = 32):
    """Full-width SD-2.1 fine-tune STEP @128px with the real run's
    semantics (VERDICT r3 #2's "captured by a bench.py sd-train section").

    Route mirrors ``--segmented_sd auto``: the MONOLITHIC one-program step
    (fwd+bwd+global clip+AdamW+EMA, donated, remat — r4: compiles on the
    tunnel, 13.5x the per-stage chain) with the segmented per-stage-VJP
    chain as fallback when the compile transport rejects the full-width
    HLO.  Set BENCH_SDTRAIN_ROUTE=seg to force the fallback measurement.
    Params are zeros (MXU/VPU timing is data-independent, see bench_sd)."""
    route = os.environ.get("BENCH_SDTRAIN_ROUTE", "mono")
    if route == "mono":
        try:
            return _bench_sd_train_mono(latent, batch)
        except Exception as e:
            print(f"# sdtrain monolithic failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); falling back to segmented",
                  file=sys.stderr)
    return _bench_sd_train_seg(latent, batch)


def _bench_sd_train_mono(latent: int, batch: int):
    jax = _child_setup()
    import jax.numpy as jnp
    import optax

    from phendiff_tpu.core import SchedulerConfig, make_schedule
    from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
    from phendiff_tpu.train.ema import EMAConfig
    from phendiff_tpu.train.train_loop import (
        OptimizerConfig, TrainConfig, init_train_state, make_optimizer,
        make_train_step,
    )

    cfg = SDUNetConfig(sample_size=latent)
    model = SDUNet(cfg, dtype=jnp.bfloat16, remat=True)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, latent, latent, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
    )
    unet_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    ce = jnp.zeros((2, 1024), jnp.float32)
    params = {"unet": unet_params, "class_embedding": ce}
    n = sum(p.size for p in jax.tree.leaves(params))

    from phendiff_tpu.models.embeddings import pad_to_clip_sequence

    def model_apply(p, x, t, seq):
        return model.apply(p["unet"], x, t, seq)

    def embed_fn(p, labels):
        return pad_to_clip_sequence(p["class_embedding"][labels])

    schedule = make_schedule(SchedulerConfig(num_train_timesteps=1000))
    # Adam first-moment storage (train_loop.OptimizerConfig.moment_dtype):
    # bf16 halves the mu read+write of the update phase (~7 GB/step at
    # full width) — the roofline's measured optimizer lever.  f32 default
    # for continuity with the r1-r4 captures.
    moment_dtype = os.environ.get("BENCH_SDTRAIN_MOMENT_DTYPE", "float32")
    tcfg = TrainConfig(
        proba_uncond=0.1, ema=EMAConfig(),
        optimizer=OptimizerConfig(learning_rate=1e-5, max_grad_norm=1.0,
                                  moment_dtype=moment_dtype),
    )
    opt = make_optimizer(tcfg.optimizer)
    step = jax.jit(
        make_train_step(model_apply, embed_fn, schedule, tcfg, opt),
        donate_argnums=(0,),
    )
    state = init_train_state(params, opt, copy=False)
    x0 = jax.random.normal(jax.random.key(1), (batch, latent, latent, 4))
    labels = jnp.tile(jnp.array([0, 1], jnp.int32), batch // 2)

    t0 = time.perf_counter()
    state, m = step(state, (x0, labels), jax.random.key(2))
    _force(m["loss"], jax.tree.leaves(state.params)[0])
    print(f"# sdtrain mono compile+first: {time.perf_counter() - t0:.1f}s "
          f"({n / 1e6:.0f}M params)", file=sys.stderr)

    # forward FLOPs for MFU: fwd + bwd(2x) + remat extra fwd ~ 4x fwd
    fwd_flops = None
    try:
        fwd = jax.jit(lambda p, xx: model_apply(p, xx, labels * 0 + 1,
                                                embed_fn(p, labels)))
        ca = fwd.lower(state.params, x0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fwd_flops = ca.get("flops") if ca else None
    except Exception:
        pass

    iters = int(os.environ.get("BENCH_SDTRAIN_ITERS", "10"))
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, (x0, labels), jax.random.key(3 + i))
    _force(m["loss"], jax.tree.leaves(state.params)[0])
    dt = time.perf_counter() - t0
    sustained = fwd_flops * 4.0 * iters / dt if fwd_flops else None
    return {
        "metric": f"sd_train_samples_per_sec_per_chip_{latent * 8}px",
        "value": round(batch * iters / dt, 2),
        "unit": "samples/s/chip",
        "batch": batch,
        "latent": latent,
        "route": "monolithic",
        "moment_dtype": moment_dtype,
        "step_time_s": round(dt / iters, 3),
        "tflops_per_sec": round(sustained / 1e12, 1) if sustained else None,
        "mfu": round(sustained / CHIP_PEAK_FLOPS, 3) if sustained else None,
    }


def _bench_sd_train_seg(latent: int, batch: int):
    jax = _child_setup()
    import jax.numpy as jnp
    import optax

    from phendiff_tpu.core import SchedulerConfig, make_schedule
    from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
    from phendiff_tpu.models.sd_unet import SDUNetConfig
    from phendiff_tpu.train.segmented_train import CtxEmbed, SegmentedSDTrainStep

    # "recompute" (2x backward, ≤1 stage's grads live) is the only mode
    # known to fit full width + EMA + moments on a 16 GB chip with the f32
    # cache; "cache" pairs with the bf16 gradient cache (1.75 GB) — set
    # BENCH_SD_CLIP_MODE=cache to measure that lever (VERDICT r3 #2).
    clip_mode = os.environ.get("BENCH_SD_CLIP_MODE", "recompute")
    cache_dtype = jnp.bfloat16 if clip_mode == "cache" else None
    cfg = SDUNetConfig(sample_size=latent)
    seg = SegmentedSDUNet(cfg, dtype=jnp.bfloat16)
    ctx = CtxEmbed(num_classes=2, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        seg.init, jax.random.key(0),
        jnp.zeros((1, latent, latent, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
    )
    merged = {k: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)
              for k, v in shapes["params"].items()}
    ce_shapes = jax.eval_shape(ctx.init, jax.random.key(0), jnp.zeros((1,), jnp.int32))
    merged["class_embedding"] = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        ce_shapes["params"]["class_embedding"],
    )
    params = {"params": merged}
    n = sum(p.size for p in jax.tree.leaves(params))

    schedule = make_schedule(SchedulerConfig(num_train_timesteps=1000))
    from phendiff_tpu.train.ema import EMAConfig

    step_fn = SegmentedSDTrainStep(
        seg, schedule, optax.adamw(1e-5), proba_uncond=0.1,
        ema=EMAConfig(),
        max_grad_norm=1.0, clip_mode=clip_mode, ctx_module=ctx,
        cache_dtype=cache_dtype,
    )
    # forward FLOPs for MFU (train step ≈ 3x fwd + clip-mode extra)
    x0 = jax.random.normal(jax.random.key(1), (batch, latent, latent, 4))
    emb_probe = jnp.zeros((batch, 77, 1024))
    t_probe = jnp.full((batch,), 1, jnp.int32)
    t0 = time.perf_counter()
    fwd_flops = seg.cost_flops(params, x0, t_probe, emb_probe)
    bwd_mult = 3.0 if clip_mode != "recompute" else 5.0  # fwd + (2x bwd) [+ 2x bwd]
    print(f"# sdtrain stage compiles: {time.perf_counter() - t0:.1f}s "
          f"({n / 1e6:.0f}M params, clip={clip_mode})", file=sys.stderr)

    opt_state = step_fn.init_opt_state(params)
    ema = jax.tree.map(jnp.copy, params)
    labels = jnp.tile(jnp.array([0, 1], jnp.int32), batch // 2)

    t0 = time.perf_counter()
    params, opt_state, ema, m = step_fn(
        params, opt_state, x0, labels, jax.random.key(2),
        donate=True, ema_params=ema, step=0,
    )
    _force(m["loss"], jax.tree.leaves(params)[0])
    print(f"# sdtrain first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    iters = int(os.environ.get("BENCH_SDTRAIN_ITERS", "5"))
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, ema, m = step_fn(
            params, opt_state, x0, labels, jax.random.key(3 + i),
            donate=True, ema_params=ema, step=1 + i,
        )
    # iters chain through params/opt_state; forcing the final loss covers
    # everything up to the last forward, a param leaf covers the last apply
    _force(m["loss"], jax.tree.leaves(params)[0])
    dt = time.perf_counter() - t0
    sustained = fwd_flops * bwd_mult * iters / dt
    return {
        "metric": f"sd_train_samples_per_sec_per_chip_{latent * 8}px",
        "value": round(batch * iters / dt, 2),
        "unit": "samples/s/chip",
        "batch": batch,
        "latent": latent,
        "route": "segmented",
        "clip_mode": clip_mode,
        "step_time_s": round(dt / iters, 3),
        "tflops_per_sec": round(sustained / 1e12, 1),
        "mfu": round(sustained / CHIP_PEAK_FLOPS, 3),
    }


def run_section(section: str) -> dict:
    if section == "train":
        return bench_train()
    if section == "transfer":
        return bench_transfer()
    if section == "sd128":
        return bench_sd(16, int(os.environ.get("BENCH_SD_BATCH_128", "64")))
    if section == "sd512":
        return bench_sd(64, int(os.environ.get("BENCH_SD_BATCH_512", "8")))
    if section == "sdtrain":
        return bench_sd_train(16, int(os.environ.get("BENCH_SDTRAIN_BATCH", "32")))
    raise ValueError(f"unknown section {section!r}")


# ---------------------------------------------------------------------------
# Parent: probe, watchdogged children, last-good fallback (no jax import)
# ---------------------------------------------------------------------------

_PROBE_CODE = (
    "import os;"
    "plat=os.environ.setdefault('JAX_PLATFORMS','axon,cpu');"
    "import jax;"
    "jax.config.update('jax_platforms',plat);"  # beats the sitecustomize
    "ds=jax.devices();"
    "print('# probe ok:',ds[0]);"
)


def _probe_backend() -> tuple:
    """Bounded backend-acquisition probe: the PJRT plugin can hang forever
    in a retry sleep when the tunnel is down (BENCH_r03 post-mortem) — a
    subprocess timeout turns that into a clean bounded failure."""
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "5"))
    timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "150"))
    gap = int(os.environ.get("BENCH_PROBE_GAP", "45"))
    last_err = ""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=timeout,
            )
            if r.returncode == 0:
                return True, ""
            last_err = (r.stderr or r.stdout).strip().splitlines()[-1:] or [""]
            last_err = last_err[0][:300]
        except subprocess.TimeoutExpired:
            last_err = f"backend init hang (>{timeout}s, attempt {i + 1})"
        print(f"# probe attempt {i + 1}/{attempts} failed: {last_err}",
              file=sys.stderr)
        if i + 1 < attempts:
            time.sleep(gap)
    return False, last_err


def _run_child(section: str, budget_cap: int = 10**9) -> tuple:
    """One section in a watchdogged subprocess; returns (result|None, err)."""
    env = dict(os.environ, BENCH_CHILD="1", BENCH_MODE=section)
    budget = min(WATCHDOG[section], budget_cap)
    for attempt in range(2):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, timeout=budget, env=env,
            )
        except subprocess.TimeoutExpired:
            return None, f"{section}: watchdog expired after {budget}s"
        sys.stderr.write(r.stderr or "")
        if r.returncode == 0:
            for line in reversed((r.stdout or "").strip().splitlines()):
                try:
                    return json.loads(line), ""
                except json.JSONDecodeError:
                    continue
            return None, f"{section}: child printed no JSON"
        err = (r.stderr or r.stdout).strip().splitlines()[-1:] or [""]
        err = f"{section}: child rc={r.returncode}: {err[0][:300]}"
        # one retry, only for fast failures (transient tunnel handoff —
        # the single-client backend can reject right after a process exit)
        if attempt == 0:
            time.sleep(int(os.environ.get("BENCH_RETRY_GAP", "60")))
            continue
        return None, err
    return None, err


def _flatten(section: str, res: dict) -> dict:
    """Map a section result onto the combined line's key space."""
    if section == "transfer":
        return dict(res)  # the headline carries metric/value/unit
    if section == "train":
        return {"train_samples_per_sec_per_chip": res["value"],
                "train_mfu": res.get("mfu")}
    if section == "sd128":
        return {"sd_transfers_per_sec_per_chip_128px": res["value"],
                "sd_mfu_128px": res.get("mfu")}
    if section == "sd512":
        return {"sd_transfers_per_sec_per_chip_512px": res["value"],
                "sd_mfu_512px": res.get("mfu")}
    if section == "sdtrain":
        return {"sd_train_samples_per_sec_per_chip_128px": res["value"],
                "sd_train_step_time_s": res.get("step_time_s"),
                "sd_train_mfu_128px": res.get("mfu")}
    return {}


def _load_last_good() -> dict:
    try:
        with open(LAST_GOOD_PATH) as f:
            return json.load(f)
    except Exception:
        return {"sections": {}}


def _save_last_good(store: dict) -> None:
    try:
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump(store, f, indent=2, sort_keys=True)
    except Exception as e:  # persisting is best-effort
        print(f"# could not write {LAST_GOOD_PATH}: {e}", file=sys.stderr)


def _emit_combined(sections, fresh, store, errors) -> None:
    """Assemble + print the combined JSON line: fresh sections verbatim,
    missing ones from last-good marked stale.  Called after EVERY completed
    section (VERDICT r4 #1b): the driver takes the LAST complete line, so
    an external kill loses at most the in-flight section."""
    out = {}
    stale_sections = []
    for s in sections:
        if s in fresh:
            out.update(_flatten(s, fresh[s]))
        elif s in store.get("sections", {}):
            entry = store["sections"][s]
            out.update(_flatten(s, entry["result"]))
            stale_sections.append({"section": s, "captured_at": entry["captured_at"]})
    if stale_sections:
        out["stale"] = True
        out["stale_sections"] = stale_sections
    if errors:
        out["error"] = "; ".join(errors)
    if "metric" not in out:
        # nothing at all (no fresh headline, no last-good): still one line
        out.setdefault("metric", f"img2img_transfers_per_sec_per_chip_{STEPS}step_{RES}px")
        out.setdefault("value", None)
        out.setdefault("unit", "transfers/s/chip")
        out.setdefault("vs_baseline", None)
    out["fresh_sections"] = sorted(fresh)
    print(json.dumps(out), flush=True)


# When the remaining global budget is tighter than a section's full
# watchdog, pass reduced iteration counts to the child (shed load — fewer
# timed iters — instead of skipping the section, VERDICT r4 #1d).
_SHED_ITERS = {
    "transfer": ("BENCH_ITERS", "1"),
    "train": ("BENCH_ITERS", "4"),
    "sdtrain": ("BENCH_SDTRAIN_ITERS", "3"),
}


def main_parent() -> int:
    # Global deadline: the parent ALWAYS prints its one JSON line with
    # time to spare, even if every section hits its watchdog — an external
    # kill of a still-running bench.py would lose the artifact entirely.
    # 1800s default: the driver's kill budget is tighter than the r4
    # default of 5400s, which cost that round its parsed artifact.
    deadline = time.monotonic() + int(os.environ.get("BENCH_DEADLINE", "1800"))
    sections = [MODE] if MODE in SECTIONS else list(SECTIONS)
    store = _load_last_good()
    errors = []
    fresh = {}
    _emit_combined(sections, fresh, store, errors)  # a line exists from t=0

    ok, probe_err = _probe_backend()
    if ok:
        # the single-client tunnel can transiently reject a new process
        # right after the probe's exits — give it a moment
        time.sleep(int(os.environ.get("BENCH_CHILD_DELAY", "10")))
        for s in sections:
            remaining = deadline - time.monotonic()
            if remaining < 120:
                errors.append(
                    f"{s}: skipped (global deadline, {remaining:.0f}s left)"
                )
                _emit_combined(sections, fresh, store, errors)
                continue
            if remaining < WATCHDOG[s] and s in _SHED_ITERS:
                var, val = _SHED_ITERS[s]
                if var not in os.environ:
                    os.environ[var] = val  # inherited by the child
                    print(f"# {s}: shedding load ({var}={val}, "
                          f"{remaining:.0f}s left)", file=sys.stderr)
            res, err = _run_child(s, budget_cap=int(remaining - 60))
            if res is not None:
                fresh[s] = res
                prev = store["sections"].get(s)
                if (res.get("contended")
                        and prev is not None
                        and not prev["result"].get("contended")):
                    # never displace a clean capture with a contended one
                    print(f"# {s}: fresh capture is contended "
                          f"(load {res.get('load_avg_1m')}); keeping the "
                          f"clean last-good entry", file=sys.stderr)
                else:
                    store["sections"][s] = {
                        "result": res,
                        "captured_at": time.strftime(
                            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    }
                    _save_last_good(store)  # persist after EVERY section
            else:
                errors.append(err)
            _emit_combined(sections, fresh, store, errors)
            time.sleep(int(os.environ.get("BENCH_SECTION_GAP", "10")))
    else:
        errors.append(f"backend probe failed: {probe_err}")
        _emit_combined(sections, fresh, store, errors)
    return 0


def main():
    if os.environ.get("BENCH_CHILD") == "1":
        section = MODE if MODE in SECTIONS else "transfer"
        res = run_section(section)
        # capture-time provenance (VERDICT r4 weak #5): a number measured
        # while the host is loaded (test suite, another bench) is flagged
        # so the parent never persists it over a clean one
        load1 = os.getloadavg()[0]
        res["load_avg_1m"] = round(load1, 2)
        res["contended"] = load1 > CONTENTION_LOAD
        print(json.dumps(res))
        return 0
    return main_parent()


if __name__ == "__main__":
    sys.exit(main())
