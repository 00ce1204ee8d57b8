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
    out.block_until_ready()

    with jax.profiler.trace(OUTDIR):
        for _ in range(3):
            out = compiled(x)
        out.block_until_ready()
    print("trace written to", OUTDIR)

    # -- parse the trace JSON --------------------------------------------
    paths = sorted(glob.glob(os.path.join(OUTDIR, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz found")
        return
    parse(paths[-1])


def parse(path, iters=3, top=45):
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
        cat[args_of[name].get("hlo_category", "?")] += e.get("dur", 0)
    total = sum(tot.values())
    print(f"total device op time: {total/1e3/iters:.2f} ms per iter")
    for name, us in cat.most_common(12):
        print(f"  category {us/1e3/iters:8.3f} ms  {name}")
    for name, us in tot.most_common(top):
        ln = args_of[name].get("long_name", "")[:90]
        print(f"{us/1e3/iters:9.3f} ms x{cnt[name]:4d}  {name[:40]:40s} {ln}")


if __name__ == "__main__":
    main()
