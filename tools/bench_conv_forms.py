"""Microbenchmark: alternative formulations of the level-0 (64-channel)
conv on the attached TPU.

The r3 profile (docs/BENCHMARKS.md) shows L0 convs at ~29% MFU: the
64-lane minor dim pads to 128 in tiled layouts (2x HBM traffic) and the
Cout=64 matmul wastes half the MXU lanes.  Candidates:

  nhwc    — today's form: lax.conv NHWC, [B,H,W,64]
  packed  — W-packed: activations [B,H,W/2,128] (2 pixels x 64ch in the
            minor dim), conv expressed as a DENSE [3,3,128,128] conv whose
            weights carry structured zeros (2x algorithmic FLOPs at full
            MXU utilization, half the HBM traffic)
  nchw    — lax.conv with NCHW dimension numbers (W minor, 128-aligned)
  pair    — two independent 64-ch convs batched as ONE [3,3,64,128] conv
            (upper bound for any N-padding fix that keeps NHWC layout)

Each candidate is numerically checked against nhwc before timing.

Usage: python tools/bench_conv_forms.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import jax.numpy as jnp
from phendiff_tpu.obs.profiling import force_sync
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, H, W, C = 32, 128, 128, 64
ITERS = 20


def timeit(name, fn, x, *args):
    """fn's output must have x's shape — iterations are dependency-chained
    INSIDE one jitted composite (chain = x + 0*fn(x)), so the chaining add
    fuses and the measured time is the op itself."""

    def chained(x, *a):
        for _ in range(ITERS):
            x = x + 0.0 * fn(x, *a)
        return x

    c = jax.jit(chained).lower(x, *args).compile()
    out = c(x, *args)
    force_sync(out)
    t0 = time.perf_counter()
    out = c(x, *args)
    force_sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:8s} {dt*1e3:7.3f} ms")
    return dt


def main():
    k = jax.random.key(0)
    x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.05

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_nhwc(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)

    ref = jax.jit(conv_nhwc)(x, w)

    # ---- packed: [B,H,W/2,128], dense [3,3,128,128] with structured zeros
    # out pixel (2j+p) channel c  <-  sum_{dy,dx,ci} wgt[dy,dx,ci,c] * in[.., 2j+p+dx-1, ci]
    # packed input slot (dy, dxp, ci + 64*pi) maps to pixel 2(j+dxp-1)+pi
    wp = np.zeros((3, 3, 2 * C, 2 * C), np.float32)
    wnp = np.asarray(w, np.float32)
    for p_out in range(2):          # output pixel parity within the packed pair
        for dx in (-1, 0, 1):       # true kernel dx
            px = p_out + dx         # source pixel offset relative to pair start: in [-1, 2]
            dxp = (px + 2) // 2 - 1 + 1  # packed-cell offset in {-1,0,1} -> index dxp+1
            pi = (px + 2) % 2       # parity within that packed cell
            for dy in range(3):
                wp[dy, dxp, pi * C:(pi + 1) * C, p_out * C:(p_out + 1) * C] += \
                    wnp[dy, dx + 1, :, :]
    wp = jnp.asarray(wp, jnp.bfloat16)
    xp = x.reshape(B, H, W // 2, 2 * C)
    dnp = jax.lax.conv_dimension_numbers(xp.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_packed(xp, wp):
        return jax.lax.conv_general_dilated(xp, wp, (1, 1), "SAME", dimension_numbers=dnp)

    got = jax.jit(conv_packed)(xp, wp).reshape(B, H, W, C)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    scale = float(jnp.std(ref.astype(jnp.float32)))
    print(f"# packed max err {err:.4f} (out std {scale:.3f})")
    assert err < 0.2 * scale, "packed form wrong"

    # ---- nchw
    xc = jnp.transpose(x, (0, 3, 1, 2))
    dnc = jax.lax.conv_dimension_numbers(xc.shape, w.shape, ("NCHW", "HWIO", "NCHW"))

    def conv_nchw(xc, w):
        return jax.lax.conv_general_dilated(xc, w, (1, 1), "SAME", dimension_numbers=dnc)

    got = jnp.transpose(jax.jit(conv_nchw)(xc, w), (0, 2, 3, 1))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"# nchw max err {err:.4f}")

    # ---- pair: upper bound — one conv with Cout=128 (two independent convs)
    w2 = jnp.concatenate([w, w], axis=3)

    def conv_pair(x, w2):
        out = jax.lax.conv_general_dilated(x, w2, (1, 1), "SAME",
                                           dimension_numbers=dn)
        return out[..., :C] + out[..., C:]  # fold back to input shape

    t_nhwc = timeit("nhwc", conv_nhwc, x, w)
    t_packed = timeit("packed", conv_packed, xp, wp)
    t_nchw = timeit("nchw", conv_nchw, xc, w)
    t_pair = timeit("pair2x", conv_pair, x, w2)  # does 2x the work!
    flops = 2 * B * H * W * 9 * C * C
    print(f"# algorithmic: {flops/1e9:.1f} GFLOP; ideal @197T = {flops/197e12*1e3:.3f} ms")
    print(f"# nhwc   {flops/t_nhwc/1e12:6.1f} TFLOP/s")
    print(f"# packed {flops/t_packed/1e12:6.1f} TFLOP/s (algorithmic)")
    print(f"# nchw   {flops/t_nchw/1e12:6.1f} TFLOP/s")
    print(f"# pair   {2*flops/t_pair/1e12:6.1f} TFLOP/s for 2 convs -> per-conv {t_pair/2*1e3:.3f} ms")


if __name__ == "__main__":
    main()
