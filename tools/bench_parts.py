"""Per-component microbenchmarks of the flagship forward on real hardware.

Breaks the 128px super_small forward (the transfer hot loop's only work,
reference hot loop: utils_Img2Img.py:763-800) into its constituent stacks
so the optimization budget is measured, not guessed:

  parts  — resnet stacks per level, attention stack, GN, up/down sample,
           matmul floors for the attention shapes, full forward.
  attn   — attention implementation variants at the real shapes.

Usage: python tools/bench_parts.py [parts|attn]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from phendiff_tpu.obs.profiling import force_sync
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def timeit(compiled, *args, iters=ITERS):
    out = compiled(*args)
    force_sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(*args)
        force_sync(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench(label, fn, *args, flops=None, count=1):
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    ct = time.perf_counter() - t0
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_flops = ca.get("flops", 0) if ca else 0
    except Exception:
        xla_flops = 0
    dt = timeit(compiled, *args)
    f = flops or xla_flops
    tf = f / dt / 1e12 if f else 0.0
    print(
        f"{label:44s} {dt*1e3/count:8.3f} ms/unit  x{count:<3d} total "
        f"{dt*1e3:8.2f} ms  {tf:6.1f} TF/s  (compile {ct:.0f}s)",
        flush=True,
    )
    return dt


def resnet_stack(c_in, c_out, hw, n, concat=False, temb_dim=256):
    """n chained resnet blocks at one level's shapes."""
    from phendiff_tpu.models.unet2d import ResnetBlock

    blk = ResnetBlock(c_out, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(0), (BATCH, hw, hw, c_in), jnp.bfloat16)
    temb = jax.random.normal(jax.random.key(1), (BATCH, temb_dim), jnp.bfloat16)
    params = [
        blk.init(jax.random.key(i), x if i == 0 else
                 jnp.zeros((BATCH, hw, hw, c_out), jnp.bfloat16), temb)
        for i in range(n)
    ]

    def run(x, temb):
        h = blk.apply(params[0], x, temb)
        for p in params[1:]:
            h = blk.apply(p, h, temb)
        return h

    return run, (x, temb)


def main_parts():
    from phendiff_tpu.models import CondUNet2D
    from phendiff_tpu.models import config as C
    from phendiff_tpu.models.unet2d import Downsample2D, SelfAttention2D, Upsample2D
    from phendiff_tpu.ops.group_norm import group_norm

    print(f"# device={jax.devices()[0]} batch={BATCH}", flush=True)

    # full forward, for reference
    cfg = C.super_small().replace(sample_size=128)
    model = CondUNet2D(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(0), (BATCH, 128, 128, 3))
    t = jnp.zeros((BATCH,), jnp.int32)
    lab = jnp.zeros((BATCH,), jnp.int32)
    params = model.init(jax.random.key(0), x[:1], t[:1], class_labels=lab[:1])
    bench("full forward", lambda xx: model.apply(params, xx, t, class_labels=lab), x)

    # resnet stacks per level (4 chained blocks each)
    for c_in, c_out, hw, concat, label in [
        (64, 64, 128, False, "resnet L0 64ch @128^2"),
        (128, 64, 128, False, "resnet L0 concat-in 128->64 @128^2"),
        (128, 128, 64, False, "resnet L1 128ch @64^2"),
        (256, 128, 64, False, "resnet L1 concat-in 256->128 @64^2"),
        (256, 256, 32, False, "resnet L2 256ch @32^2"),
    ]:
        run, args = resnet_stack(c_in, c_out, hw, 4)
        bench(label + " x4", run, *args, count=4)

    # attention stack at the real level-2 shapes (6 layers in the model)
    attn = SelfAttention2D(8, dtype=jnp.bfloat16)
    xa = jax.random.normal(jax.random.key(2), (BATCH, 32, 32, 256), jnp.bfloat16)
    ap = [attn.init(jax.random.key(3 + i), xa) for i in range(6)]

    def attn6(x):
        for p in ap:
            x = attn.apply(p, x)
        return x

    bench("SelfAttention2D @32^2 x6 (pallas auto)", attn6, xa, count=6)

    # GroupNorm solo at level-0 shapes
    xg = jax.random.normal(jax.random.key(4), (BATCH, 128, 128, 64), jnp.bfloat16)
    sc = jnp.ones((64,)); bi = jnp.zeros((64,))

    def gn8(x):
        for _ in range(8):
            x = group_norm(x, num_groups=32, eps=1e-5, scale=sc, bias=bi,
                           act="silu", out_dtype=jnp.bfloat16)
        return x

    bench("GroupNorm+SiLU 64ch @128^2 x8", gn8, xg, count=8)

    # up/down sampling
    up = Upsample2D(64, dtype=jnp.bfloat16)
    xu = jax.random.normal(jax.random.key(5), (BATCH, 64, 64, 64), jnp.bfloat16)
    upp = up.init(jax.random.key(6), xu)
    bench("Upsample2D 64ch 64->128", lambda x: up.apply(upp, x), xu)
    down = Downsample2D(64, dtype=jnp.bfloat16)
    xd = jax.random.normal(jax.random.key(7), (BATCH, 128, 128, 64), jnp.bfloat16)
    dnp_ = down.init(jax.random.key(8), xd)
    bench("Downsample2D 64ch 128->64", lambda x: down.apply(dnp_, x), xd)

    # MXU floors at the attention shapes: batched [S,D]x[D,S] and [S,S]x[S,D]
    q = jax.random.normal(jax.random.key(9), (BATCH * 32, 1024, 8), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(10), (BATCH * 32, 1024, 8), jnp.bfloat16)

    def qk(q, k):
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    bench("floor: QK^T bhqd x6-layer equiv", lambda a, b: qk(a, b).sum(),
          q, k, count=1)

    p = jax.random.normal(jax.random.key(11), (BATCH * 32, 1024, 1024), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(12), (BATCH * 32, 1024, 8), jnp.bfloat16)

    def av(p, v):
        return jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    bench("floor: AV (p in HBM!)", lambda a, b: av(a, b), p, v)

    # conv GEMM floor at level-0 shapes: [B*H*W, 576] x [576, 64]
    a = jax.random.normal(jax.random.key(13), (BATCH * 128 * 128, 576), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(14), (576, 64), jnp.bfloat16)
    bench("floor: L0-conv GEMM [BHW,576]x[576,64]",
          lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32), a, w)
    a2 = jax.random.normal(jax.random.key(15), (BATCH * 64 * 64, 1152), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.key(16), (1152, 128), jnp.bfloat16)
    bench("floor: L1-conv GEMM [BHW,1152]x[1152,128]",
          lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32), a2, w2)


def main_attn():
    from phendiff_tpu.ops.attention import attention_xla
    from phendiff_tpu.ops.flash_attention import flash_attention

    S, H, D = 1024, 32, 8
    q = jax.random.normal(jax.random.key(0), (BATCH, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (BATCH, S, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (BATCH, S, H, D), jnp.bfloat16)
    fl = 4 * BATCH * H * S * S * D

    bench("pallas fused (current)", lambda a, b, c: flash_attention(a, b, c),
          q, k, v, flops=fl)
    bench("xla materialized", lambda a, b, c: attention_xla(a, b, c),
          q, k, v, flops=fl)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parts"
    if mode == "parts":
        main_parts()
    elif mode == "attn":
        main_attn()
