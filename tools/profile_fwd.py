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
    model = CondUNet2D(cfg, dtype=jnp.bfloat16)
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

    # -- parse the xplane protobuf ---------------------------------------
    paths = sorted(glob.glob(os.path.join(OUTDIR, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found")
        return
    parse(paths[-1])


def parse(path):
    from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        totals = {}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                pass
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals.setdefault((line.name, name), [0, 0])
                totals[(line.name, name)][0] += ev.duration_ps / 1e9  # ms
                totals[(line.name, name)][1] += 1
        rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
        print(f"== plane: {plane.name}")
        for (lname, name), (ms, n) in rows[:60]:
            print(f"{ms/3:9.3f} ms  x{n:4d}  [{lname}] {name[:110]}")


if __name__ == "__main__":
    main()
