"""Per-phase attribution of the full-width SD-2.1 train step ON HARDWARE.

VERDICT r4 weak #3: the monolithic fine-tune step measured ~0.13 MFU while
the SAME model's inference scan sustains 0.67 — a ~5x residual beyond the
fwd/bwd multiplier with no attribution.  This tool times each phase of the
step separately so the residual lands on named suspects (the r3 transfer
audit's per-op-floor methodology, docs/BENCHMARKS.md):

* ``fwd``        — one jitted batched UNet forward (the 0.67-MFU baseline)
* ``grad``       — value_and_grad of the training loss, remat ON (the
                   bench configuration: fwd + remat-fwd + bwd ~ 4x fwd)
* ``grad_nr``    — same with remat OFF (isolates the remat extra forward;
                   guarded — full width @128px may not fit without remat)
* ``opt``        — achievable clip+AdamW+EMA HBM bandwidth, measured on a
                   synthetic ~200M-param tree (``opt_micro``) and scaled:
                   the full-width standalone opt program compile-OOMs
                   (17.3 GB of argument trees vs 15.75 GB HBM) and the
                   failed compile wedges the tunnel session, so the
                   full-width opt cost is attributed as (full − grad);
                   ``--attempt-standalone-opt`` opts into the OOM repro
* ``full``       — the real train step (make_train_step), remat ON
* ``full_nr``    — the real train step, remat OFF (guarded)

Run at batch 32 AND 64 (the reference's SD config is 64/GPU,
``examples/examples_training_scripts/launch_script_SD.sh:16``; larger
batch amortizes the optimizer traffic).  Params are zeros of the right
shapes (MXU/VPU timing is data-independent, see bench.py).

Usage:
    python tools/roofline_sd_train.py [--res 128] [--batches 32,64]
                                      [--iters 10] [--skip-noremat]
                                      [--moment-dtype float32|bfloat16]
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
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.obs.profiling import force_sync
from phendiff_tpu.train.ema import EMAConfig
from phendiff_tpu.train.train_loop import (
    OptimizerConfig, TrainConfig, init_train_state, make_optimizer,
    make_train_step,
)

CHIP_PEAK_FLOPS = float(os.environ.get("BENCH_CHIP_PEAK_FLOPS", 197e12))
HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", 819e9))  # v5e: 819 GB/s


def _tree_bytes(t) -> int:
    return sum(p.size * p.dtype.itemsize for p in jax.tree.leaves(t))


def _time_compiled(compiled, args, iters, donate_chain=None):
    """Median-free simple timing: warm once, then `iters` chained calls
    behind one force_sync (the r4 host-fetch barrier)."""
    out = compiled(*args)
    force_sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    force_sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def build(latent: int, batch: int, remat: bool, moment_dtype):
    cfg = SDUNetConfig(sample_size=latent)
    model = SDUNet(cfg, dtype=jnp.bfloat16, remat=remat)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, latent, latent, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
    )
    unet_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = {"unet": unet_params,
              "class_embedding": jnp.zeros((2, 1024), jnp.float32)}

    def model_apply(p, x, t, seq):
        return model.apply(p["unet"], x, t, seq)

    def embed_fn(p, labels):
        return pad_to_clip_sequence(p["class_embedding"][labels])

    schedule = make_schedule(SchedulerConfig(num_train_timesteps=1000))
    ocfg = OptimizerConfig(learning_rate=1e-5, max_grad_norm=1.0,
                           moment_dtype=moment_dtype)
    tcfg = TrainConfig(proba_uncond=0.1, ema=EMAConfig(), optimizer=ocfg)
    opt = make_optimizer(ocfg)
    x0 = jax.random.normal(jax.random.key(1), (batch, latent, latent, 4))
    labels = jnp.tile(jnp.array([0, 1], jnp.int32), batch // 2)
    return (cfg, model, model_apply, embed_fn, schedule, tcfg, opt, params,
            x0, labels)


def phase_fwd(built, batch, iters):
    (_, _, model_apply, embed_fn, _, _, _, params, x0, labels) = built
    t = jnp.full((batch,), 500, jnp.int32)

    @jax.jit
    def fwd(p, xx):
        return model_apply(p, xx, t, embed_fn(p, labels))

    t0 = time.perf_counter()
    compiled = fwd.lower(params, x0).compile()
    comp_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = ca.get("flops") if ca else None
    dt = _time_compiled(compiled, (params, x0), iters)
    return dt, comp_s, flops


def phase_grad(built, batch, iters):
    (_, _, model_apply, embed_fn, schedule, tcfg, _, params, x0, labels) = built
    from phendiff_tpu.train.train_loop import diffusion_loss

    def loss_fn(p, xx, rng):
        class_emb = embed_fn(p, labels)
        return diffusion_loss(model_apply, p, schedule, xx, class_emb, rng)

    @jax.jit
    def grad_step(p, xx, rng):
        return jax.value_and_grad(loss_fn)(p, xx, rng)

    rng = jax.random.key(2)
    t0 = time.perf_counter()
    compiled = grad_step.lower(params, x0, rng).compile()
    comp_s = time.perf_counter() - t0
    dt = _time_compiled(compiled, (params, x0, rng), iters)
    return dt, comp_s


def phase_opt_micro(iters, n_params=200_000_000):
    """Adam + EMA update GB/s on a synthetic flat tree that FITS.

    The full-width standalone opt phase cannot run: grads + mu + nu +
    params + ema as five f32 ARGUMENT trees are 17.3 GB against 15.75 GB
    of HBM (measured OOM, r5).  The real train step fits because XLA
    fuses each weight's optimizer update into the backward that produced
    its gradient, freeing grad buffers incrementally — the monolithic
    one-program route is load-bearing, not just convenient.  So the
    achievable optimizer bandwidth is measured here on a 200M-param
    synthetic tree (5 x 0.8 GB = 4 GB resident) and scaled analytically;
    the full-width opt cost is attributed as (full - grad)."""
    import optax

    from phendiff_tpu.train.ema import EMAConfig, ema_update

    ecfg = EMAConfig()
    opt = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(1e-5)
    )
    # 2-D lane-aligned shape: a 1-D 200M-element eager allocation is
    # rejected by the tunnel's TPU backend (INVALID_ARGUMENT, r5); the
    # (rows, 2048) layout is what the hardware tiles natively anyway.
    shape = (n_params // 2048, 2048)

    @jax.jit
    def _init():
        pp = {"w": jnp.zeros(shape, jnp.float32)}
        return pp, opt.init(pp), jax.tree.map(jnp.copy, pp), \
            jax.tree.map(jnp.ones_like, pp)

    p, opt_state, ema, grads = _init()

    def update(g, os_, pp, e):
        updates, os2 = opt.update(g, os_, pp)
        p2 = optax.apply_updates(pp, updates)
        e2 = ema_update(ecfg, e, p2, 1)
        return os2, p2, e2

    compiled = (jax.jit(update, donate_argnums=(1, 2, 3))
                .lower(grads, opt_state, p, ema).compile())
    nbytes = (_tree_bytes(grads) + _tree_bytes(opt_state)
              + _tree_bytes(p) + _tree_bytes(ema))
    os_, pp, e = compiled(grads, opt_state, p, ema)
    force_sync(jax.tree.leaves(pp)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        os_, pp, e = compiled(grads, os_, pp, e)
    force_sync(jax.tree.leaves(pp)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, nbytes


def phase_opt(built, batch, iters):
    """clip + AdamW + EMA alone: the pure state-traffic phase."""
    (_, _, _, _, _, tcfg, opt, params, _, _) = built
    import optax

    opt_state = opt.init(params)
    ema = jax.tree.map(jnp.copy, params)
    grads = jax.tree.map(jnp.ones_like, params)

    from phendiff_tpu.train.ema import ema_update

    @jax.jit
    def update(g, os_, p, e):
        updates, os2 = opt.update(g, os_, p)
        p2 = optax.apply_updates(p, updates)
        e2 = ema_update(tcfg.ema, e, p2, 1)
        return os2, p2, e2

    t0 = time.perf_counter()
    compiled = (jax.jit(update, donate_argnums=(1, 2, 3))
                .lower(grads, opt_state, params, ema).compile())
    comp_s = time.perf_counter() - t0
    state_bytes = (_tree_bytes(grads) + _tree_bytes(opt_state)
                   + _tree_bytes(params) + _tree_bytes(ema))

    # donation chains state through iters
    os_, p, e = compiled(grads, opt_state, params, ema)
    force_sync(jax.tree.leaves(p)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        os_, p, e = compiled(grads, os_, p, e)
    force_sync(jax.tree.leaves(p)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, comp_s, state_bytes


def phase_full(built, batch, iters):
    (_, _, model_apply, embed_fn, schedule, tcfg, opt, params, x0,
     labels) = built
    step = jax.jit(
        make_train_step(model_apply, embed_fn, schedule, tcfg, opt),
        donate_argnums=(0,),
    )
    state = init_train_state(params, opt, copy=False)
    t0 = time.perf_counter()
    state, m = step(state, (x0, labels), jax.random.key(2))
    force_sync(m["loss"], jax.tree.leaves(state.params)[0])
    comp_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, (x0, labels), jax.random.key(3 + i))
    force_sync(m["loss"], jax.tree.leaves(state.params)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, comp_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batches", default="32,64")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-noremat", action="store_true")
    ap.add_argument("--moment-dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--phases", default="fwd,grad,grad_nr,opt,full,full_nr",
                    help="comma list to run (subset for quick probes)")
    ap.add_argument("--attempt-standalone-opt", action="store_true",
                    help="try the full-width standalone opt program "
                    "(known compile-OOM that WEDGES the tunnel session; "
                    "run LAST, in a throwaway process)")
    args = ap.parse_args()
    latent = args.res // 8
    phases = set(args.phases.split(","))
    if args.skip_noremat:
        phases -= {"grad_nr", "full_nr"}

    report = {"res": args.res, "moment_dtype": args.moment_dtype,
              "load_avg_1m": round(os.getloadavg()[0], 2), "batches": {}}
    if "opt" in phases:
        # batch-independent; FIRST so a later wedge can't lose it
        try:
            mdt, mbytes = phase_opt_micro(args.iters)
            report["opt_micro"] = {
                "s": round(mdt, 4),
                "state_gb": round(mbytes / 1e9, 2),
                "achieved_gbps": round(mbytes * 1.8 / mdt / 1e9, 0),
                # reads grads+mu+nu+p+ema (5 trees), writes mu+nu+p+ema
                # (4 trees) = 9 tree-passes over 5-tree state bytes -> 1.8x
                "note": "synthetic ~200M-param adam+ema update; "
                        "traffic model 1.8x state bytes",
            }
            print(f"# opt_micro {mdt*1e3:.1f}ms "
                  f"({report['opt_micro']['achieved_gbps']} GB/s implied)",
                  file=sys.stderr)
        except Exception as e:
            report["opt_micro"] = {
                "error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"# opt_micro failed: {type(e).__name__}",
                  file=sys.stderr)
    for batch in [int(b) for b in args.batches.split(",")]:
        row = {}
        built = build(latent, batch, remat=True,
                      moment_dtype=args.moment_dtype)
        flops = None
        if "fwd" in phases:
            dt, comp, flops = phase_fwd(built, batch, args.iters)
            row["fwd"] = {"s": round(dt, 4), "compile_s": round(comp, 1),
                          "flops": flops,
                          "mfu": round(flops / dt / CHIP_PEAK_FLOPS, 3)
                          if flops else None}
            print(f"# b{batch} fwd {dt*1e3:.1f}ms mfu={row['fwd']['mfu']}",
                  file=sys.stderr)
        if "grad" in phases:
            dt, comp = phase_grad(built, batch, args.iters)
            row["grad"] = {"s": round(dt, 4), "compile_s": round(comp, 1)}
            print(f"# b{batch} grad(remat) {dt*1e3:.1f}ms", file=sys.stderr)
        if "full" in phases:
            dt, comp = phase_full(built, batch, args.iters)
            row["full"] = {"s": round(dt, 4), "compile_s": round(comp, 1),
                           "samples_per_s": round(batch / dt, 1)}
            if flops:
                row["full"]["mfu_4x_fwd"] = round(
                    4 * flops / dt / CHIP_PEAK_FLOPS, 3)
            if "grad" in row and "s" in row["grad"]:
                # full-width opt cost by DIFFERENCE: the standalone opt
                # program cannot fit (phase_opt_micro docstring)
                row["full"]["opt_by_difference_s"] = round(
                    dt - row["grad"]["s"], 4)
            print(f"# b{batch} full(remat) {dt*1e3:.1f}ms "
                  f"({batch/dt:.1f} samples/s)", file=sys.stderr)
        if "opt" in phases and args.attempt_standalone_opt \
                and not report.get("opt_standalone_failed"):
            # NOT attempted by default: the full-width standalone opt
            # program OOMs at compile (17.3 GB of f32 argument trees vs
            # 15.75 GB HBM) and the failed compile WEDGES the tunnel
            # session — every subsequent eager op in this process raises
            # INVALID_ARGUMENT (measured twice, r5; evidence
            # docs/runs/r5/roofline_standalone_opt_oom.err).  The real
            # step fits because XLA fuses each weight's update into the
            # backward that produced its gradient.
            try:
                dt, comp, nbytes = phase_opt(built, batch, args.iters)
                row["opt"] = {
                    "s": round(dt, 4), "compile_s": round(comp, 1),
                    "state_gb": round(nbytes / 1e9, 2),
                    # effective traffic if the phase were pure HBM
                    # streaming
                    "implied_gbps": round(nbytes / dt / 1e9, 0),
                }
                print(f"# b{batch} opt {dt*1e3:.1f}ms "
                      f"(state {nbytes/1e9:.1f} GB)", file=sys.stderr)
            except Exception as e:
                report["opt_standalone_failed"] = True
                row["opt"] = {
                    "error": f"{type(e).__name__}: {str(e)[:200]}"}
                print(f"# b{batch} opt (standalone) failed: "
                      f"{type(e).__name__}", file=sys.stderr)
        if phases & {"grad_nr", "full_nr"}:
            built_nr = build(latent, batch, remat=False,
                             moment_dtype=args.moment_dtype)
            if "grad_nr" in phases:
                try:
                    dt, comp = phase_grad(built_nr, batch, args.iters)
                    row["grad_nr"] = {"s": round(dt, 4),
                                      "compile_s": round(comp, 1)}
                    print(f"# b{batch} grad(no-remat) {dt*1e3:.1f}ms",
                          file=sys.stderr)
                except Exception as e:
                    row["grad_nr"] = {"error": f"{type(e).__name__}: "
                                      f"{str(e)[:160]}"}
                    print(f"# b{batch} grad(no-remat) failed: "
                          f"{type(e).__name__}", file=sys.stderr)
            if "full_nr" in phases:
                try:
                    dt, comp = phase_full(built_nr, batch, args.iters)
                    row["full_nr"] = {
                        "s": round(dt, 4), "compile_s": round(comp, 1),
                        "samples_per_s": round(batch / dt, 1)}
                    if flops:
                        row["full_nr"]["mfu_3x_fwd"] = round(
                            3 * flops / dt / CHIP_PEAK_FLOPS, 3)
                    print(f"# b{batch} full(no-remat) {dt*1e3:.1f}ms "
                          f"({batch/dt:.1f} samples/s)", file=sys.stderr)
                except Exception as e:
                    row["full_nr"] = {"error": f"{type(e).__name__}: "
                                      f"{str(e)[:160]}"}
                    print(f"# b{batch} full(no-remat) failed: "
                          f"{type(e).__name__}", file=sys.stderr)
        report["batches"][str(batch)] = row
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
