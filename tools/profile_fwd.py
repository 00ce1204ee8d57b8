"""Capture a device trace of one UNet forward (and optionally a transfer)
on the attached TPU, then print a per-op time breakdown.

Usage: python tools/profile_fwd.py [outdir]

The trace is analysed directly from the .xplane.pb protobuf (no tensorboard
needed): we aggregate XLA op durations by fusion-name prefix.
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from phendiff_tpu.models import CondUNet2D
from phendiff_tpu.models import config as C
from phendiff_tpu.obs.profiling import force_sync

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
RES = int(os.environ.get("BENCH_RES", "128"))
OUTDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/phendiff_trace"


def main():
    cfg = C.super_small().replace(sample_size=RES)
    model = CondUNet2D(
        cfg, dtype=jnp.bfloat16,
        lane_pack=os.environ.get("BENCH_LANE_PACK", "0") == "1",
    )
    x = jax.random.normal(jax.random.key(0), (BATCH, RES, RES, 3))
    t = jnp.zeros((BATCH,), dtype=jnp.int32)
    labels = jnp.zeros((BATCH,), dtype=jnp.int32)
    params = model.init(jax.random.key(0), x[:1], t[:1], class_labels=labels[:1])
    f = jax.jit(lambda xx: model.apply(params, xx, t, class_labels=labels))
    compiled = f.lower(x).compile()
    out = compiled(x)
    force_sync(out)

    with jax.profiler.trace(OUTDIR):
        for _ in range(3):
            out = compiled(x)
        force_sync(out)
    print("trace written to", OUTDIR)

    # -- parse the trace JSON --------------------------------------------
    paths = sorted(glob.glob(os.path.join(OUTDIR, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz found")
        return
    parse(paths[-1])


def parse(path, iters=3, top=45, peak_tflops=197.0):
    """Aggregate per-op device time; attribute each op's achieved
    TFLOP/s (vs bf16 peak) and effective HBM GB/s from the trace's
    model_flops / bytes_accessed so the table doubles as a roofline
    audit (docs/BENCHMARKS.md r3)."""
    import collections
    import gzip
    import json

    with gzip.open(path) as fh:
        data = json.load(fh)
    evs = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "Device" in n}
    tot = collections.Counter()
    cnt = collections.Counter()
    cat = collections.Counter()
    catf = collections.Counter()
    args_of = {}
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_"):
            continue  # whole-module envelope double-counts the ops
        tot[name] += e.get("dur", 0)
        cnt[name] += 1
        args_of.setdefault(name, e.get("args", {}))
        c = args_of[name].get("hlo_category", "?")
        cat[c] += e.get("dur", 0)
        catf[c] += int(args_of[name].get("model_flops", 0) or 0)
    total = sum(tot.values())
    tflops = sum(catf.values()) / iters
    print(f"total device op time: {total/1e3/iters:.2f} ms per iter; "
          f"model flops {tflops/1e9:.1f} GFLOP "
          f"({tflops/(total/iters*1e-6)/1e12:.1f} TFLOP/s, "
          f"MFU {tflops/(total/iters*1e-6)/(peak_tflops*1e12):.3f})")
    for name, us in cat.most_common(12):
        fl = catf[name]
        eff = fl / (us * 1e-6) / 1e12 if us else 0.0
        print(f"  category {us/1e3/iters:8.3f} ms  {eff:6.1f} TFLOP/s "
              f"(MFU {eff/peak_tflops:5.2f})  {name}")
    hdr = f"{'ms':>9} {'n':>4} {'TFLOP/s':>8} {'GB/s':>6}  name / source"
    print(hdr)
    for name, us in tot.most_common(top):
        a = args_of[name]
        fl = int(a.get("model_flops", 0) or 0) * cnt[name]
        by = int(a.get("bytes_accessed", 0) or 0) * cnt[name]
        eff = fl / (us * 1e-6) / 1e12 if us else 0.0
        gbs = by / (us * 1e-6) / 1e9 if us else 0.0
        src = a.get("source", "")
        src = src.replace("/root/repo/tools/../", "")
        print(f"{us/1e3/iters:9.3f} x{cnt[name]:3d} {eff:8.1f} {gbs:6.0f}  "
              f"{name[:36]:36s} {src[-48:]}")


if __name__ == "__main__":
    main()
