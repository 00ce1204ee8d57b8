"""Micro-benchmarks of UNet components on the real chip.

Usage: python tools/microbench.py [forward|ablate|attn]
"""

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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    force_sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def bench_forward(cfg, label):
    model = CondUNet2D(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(0), (BATCH, RES, RES, 3))
    t = jnp.zeros((BATCH,), dtype=jnp.int32)
    labels = jnp.zeros((BATCH,), dtype=jnp.int32)
    params = model.init(jax.random.key(0), x[:1], t[:1], class_labels=labels[:1])

    f = jax.jit(lambda xx: model.apply(params, xx, t, class_labels=labels))
    compiled = f.lower(x).compile()
    cost = compiled.cost_analysis()
    ca = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = ca.get("flops", 0) if ca else 0
    dt = timeit(compiled, x)
    tflops = flops / dt / 1e12
    print(
        f"{label:28s} {dt*1e3:8.2f} ms/fwd  {BATCH/dt:7.1f} img/s  "
        f"{tflops:6.1f} TFLOP/s  ({flops/1e9:.1f} GF/call)"
    )
    return dt


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ablate"
    base = C.super_small().replace(sample_size=RES)
    if mode in ("forward", "ablate"):
        bench_forward(base, "super_small (auto attn)")
    if mode == "ablate":
        no_attn = base.replace(
            down_block_types=("DownBlock2D",) * 3,
            up_block_types=("UpBlock2D",) * 3,
        )
        bench_forward(no_attn, "no attention")
        os.environ["PHENDIFF_ATTN_IMPL"] = "xla"
        bench_forward(base, "xla attention")
        os.environ["PHENDIFF_ATTN_IMPL"] = "pallas"
        bench_forward(base, "pallas attention")
        del os.environ["PHENDIFF_ATTN_IMPL"]
