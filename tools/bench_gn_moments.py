"""Microbenchmark: per-slot GroupNorm moment reductions on a packed
level-0 tensor ([32, 128, 64, 128] bf16, 67 MB).

The r3 profile shows these as `convert_reduce_fusion` ops taking
0.94-1.43 ms — ~70-140 GB/s effective, far below the chip's ~600+ GB/s
streaming rate (a same-size layout copy runs at ~0.43 ms round trip).
Candidates:

  xla      — jnp.sum(x.astype(f32)) + jnp.sum(square)  (today's form)
  xla_b16  — accumulate in bf16 (what XLA picks for some sites)
  dot      — moments as ONE matmul: ones-and-x rows — [2, B*S] @ [B*S, C]
             via concat trick (MXU does the reduction)
  pallas   — streaming Pallas kernel, grid over (B, S-tiles), f32
             accumulators revisited across tiles

Each candidate returns (ssum, ssq) per [B, C]; numerics checked vs f64.

Usage: python tools/bench_gn_moments.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
from phendiff_tpu.obs.profiling import force_sync
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, H, W2, C = 32, 128, 64, 128
ITERS = 20


def timeit(name, fn, xs):
    """xs: [ITERS, B, H, W2, C]; every slice's reduce output is live, so
    nothing is dropped and no chaining pass touches the big tensors.

    Wall clocks are useless here — the tunnel's host sync costs ~30 ms,
    larger than the whole measured program — so the per-op time comes
    from the DEVICE TRACE: run under jax.profiler.trace and report total
    device op time / ITERS."""

    def allreduce(xs):
        acc = jnp.zeros((B, C), jnp.float32)
        for i in range(ITERS):
            s, q = fn(xs[i])
            acc = acc + s + q
        return acc

    c = jax.jit(allreduce).lower(xs).compile()
    out = c(xs)
    force_sync(out)
    tdir = f"/tmp/gn_moments_trace/{name}"
    with jax.profiler.trace(tdir):
        out = c(xs)
        force_sync(out)
    dt = _device_ms(tdir) / ITERS * 1e-3
    gbs = (B * H * W2 * C * 2) / dt / 1e9 if dt else float("nan")
    print(f"{name:8s} {dt*1e3:7.3f} ms   {gbs:6.0f} GB/s (device trace)")
    return dt


def _device_ms(tdir):
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(paths[-1]) as fh:
        data = json.load(fh)
    evs = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n or "Device" in n}
    tot = 0
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev \
                and not e["name"].startswith("jit_"):
            tot += e.get("dur", 0)
    return tot / 1e3  # ms


def m_xla(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(1, 2)), jnp.sum(jnp.square(xf), axis=(1, 2))


def m_xla_b16(x):
    return (
        jnp.sum(x, axis=(1, 2)).astype(jnp.float32),
        jnp.sum(jnp.square(x), axis=(1, 2)).astype(jnp.float32),
    )


def m_dot(x):
    xf = x.reshape(B, H * W2, C)
    ones = jnp.ones((1, H * W2), jnp.bfloat16)
    s = jax.vmap(lambda v: (ones @ v.astype(jnp.bfloat16))[0])(xf)
    q = jax.vmap(lambda v: jnp.einsum("sc,sc->c", v.astype(jnp.float32),
                                      v.astype(jnp.float32)))(xf)
    return s.astype(jnp.float32), q


def _pallas_kernel(x_ref, s_ref, q_ref):
    import jax.experimental.pallas as pl  # local for CPU import safety

    xf = x_ref[...].astype(jnp.float32)  # [1, T, C]
    s = jnp.sum(xf, axis=(0, 1))
    q = jnp.sum(jnp.square(xf), axis=(0, 1))

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s_ref[...] = jnp.zeros_like(s_ref)
        q_ref[...] = jnp.zeros_like(q_ref)

    s_ref[0, 0] += s
    q_ref[0, 0] += q


def m_pallas(x, tile=512):
    import jax.experimental.pallas as pl

    S = H * W2
    xf = x.reshape(B, S, C)
    grid = (B, S // tile)
    s, q = pl.pallas_call(
        _pallas_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
    )(xf)
    return s[:, 0], q[:, 0]


def main():
    x = jax.random.normal(jax.random.key(0), (B, H, W2, C), jnp.bfloat16)
    xs = jax.random.normal(
        jax.random.key(1), (ITERS, B, H, W2, C), jnp.bfloat16)

    ref_s = np.asarray(x, np.float64).sum((1, 2))
    ref_q = (np.asarray(x, np.float64) ** 2).sum((1, 2))

    for name, fn in [("xla", m_xla), ("xla_b16", m_xla_b16),
                     ("dot", m_dot), ("pallas", m_pallas)]:
        try:
            s, q = jax.jit(fn)(x)
            es = float(np.max(np.abs(np.asarray(s, np.float64) - ref_s))) / (
                float(np.abs(ref_s).mean()) + 1e-9)
            eq = float(np.max(np.abs(np.asarray(q, np.float64) - ref_q))) / (
                float(np.abs(ref_q).mean()))
            print(f"# {name}: rel err s={es:.2e} q={eq:.2e}")
            timeit(name, fn, xs)
        except Exception as e:  # noqa: BLE001
            print(f"# {name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
