"""Lane packing: W-packed execution of narrow-channel conv trunks.

TPU tiled layouts keep the minor (channel) dim in 128-wide lanes; an NHWC
tensor with C=64 is lane-padded 2x in HBM, and a Cout=64 conv wastes half
the MXU's output lanes.  The r3 profile showed the flagship's level-0
trunk (64 channels at 128x128) running at ~29% MFU for exactly these two
reasons — ~12 ms of a 36.8 ms forward (docs/BENCHMARKS.md).

The fix implemented here: represent a [B, H, W, C] activation as
[B, H, W/2, 2C] — two horizontally-adjacent pixels' channels side by side
in the minor dim ("W-packing", pack factor 2).  Then:

* every elementwise/GroupNorm op runs on 128-aligned lanes (half the HBM
  traffic);
* a true 3x3 conv becomes a DENSE 3x3 conv over the packed grid whose
  [3, 3, 2Cin, 2Cout] kernel carries structured zeros — 2x the
  algorithmic FLOPs but at ~full MXU utilization, which on the measured
  chip is FASTER than the half-utilized true conv (0.396 vs 0.471 ms for
  the bare level-0 conv) AND halves the bandwidth of the fused epilogues.

Packed kernels are BUILT FROM THE CANONICAL [kh, kw, Cin, Cout] weights at
trace time (a linear scatter — autodiff flows through it exactly), so the
param tree, checkpoints, and initialization are IDENTICAL between packed
and unpacked execution; packing is a pure runtime representation choice.
Numerical difference vs the unpacked conv is only the contraction order of
the extra exact zeros (tests assert equality to f32 tolerance).

The channel order of a packed tensor formed by concatenating sources
s1, s2, … (true widths c1, c2, …) is [s1·p0, s1·p1, s2·p0, s2·p1, …]
(parity-major within each source) — `src_channels` tells the kernel
builder that map, so skip-concat convs need no relayout.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

P = 2  # pack factor (two pixels per lane group); fixed


def default_enabled() -> bool:
    """Product-wide default for lane-packed execution (pipelines, trainer,
    graft entry).  On: exact numerics, measured +16% end-to-end on the
    flagship (docs/BENCHMARKS.md r3).  ``PHENDIFF_LANE_PACK=0`` disables
    globally; per-level applicability (channel width, even W) is still
    decided inside the model."""
    return os.environ.get("PHENDIFF_LANE_PACK", "1") == "1"


def pack(x: Array) -> Array:
    """[B, H, W, C] → [B, H, W/2, 2C].  A logical reshape; on padded
    layouts XLA materializes it as one relayout copy — use only at
    representation boundaries."""
    b, h, w, c = x.shape
    if w % P:
        raise ValueError(f"width {w} not divisible by pack factor {P}")
    return x.reshape(b, h, w // P, P * c)


def unpack(x: Array) -> Array:
    """[B, H, W2, 2C] → [B, H, 2*W2, C]."""
    b, h, w2, cs = x.shape
    if cs % P:
        raise ValueError(f"packed channels {cs} not divisible by {P}")
    return x.reshape(b, h, w2 * P, cs // P)


def _slot_map(src_channels: Sequence[int]) -> np.ndarray:
    """slot[pi, ci] — packed-channel slot of (pixel-parity pi, true
    channel ci) for a concat of packed sources with the given widths."""
    cin = sum(src_channels)
    slot = np.zeros((P, cin), np.int64)
    base = cum = 0
    for cs in src_channels:
        for pi in range(P):
            slot[pi, cum:cum + cs] = base + pi * cs + np.arange(cs)
        base += P * cs
        cum += cs
    return slot


def channel_of_slot(src_channels: Sequence[int]) -> np.ndarray:
    """True-channel index per packed slot for a concat of packed sources
    (the inverse view of ``_slot_map``)."""
    out = []
    cum = 0
    for cs in src_channels:
        for _pi in range(P):
            out.append(np.arange(cs) + cum)
        cum += cs
    return np.concatenate(out) if out else np.zeros((0,), np.int64)


def pack_conv_kernel(w: Array, src_channels: Sequence[int]) -> Array:
    """[kh, kw, Cin, Cout] → [kh, kw, P*Cin, P*Cout] dense packed kernel
    (kw ∈ {1, 3}, stride 1, SAME padding semantics preserved — the packed
    conv's cell padding corresponds exactly to the true conv's pixel
    padding plus taps that multiply structural zeros).

    Built from pure slice/concat/stack ops (NO scatter: TPU scatters are
    slow and fare badly inside scan bodies — the first scatter-based
    version ballooned the transfer scan's compile to 19 min and regressed
    throughput)."""
    kh, kw, cin, cout = w.shape
    if kw not in (1, 3):
        raise ValueError(f"unsupported packed kernel width: {kw}")
    if sum(src_channels) != cin:
        raise ValueError(f"src_channels {src_channels} != Cin {cin}")
    half = (kw - 1) // 2
    t_blocks = []
    for t in range(kw):  # packed tap; cell offset djp = t - half
        in_rows = []
        cum = 0
        for cs in src_channels:
            for pi in range(P):
                po_blocks = []
                for po in range(P):
                    dxt = (t - half) * P + pi - po
                    if -half <= dxt <= half:
                        po_blocks.append(w[:, dxt + half, cum:cum + cs, :])
                    else:
                        po_blocks.append(jnp.zeros((kh, cs, cout), w.dtype))
                in_rows.append(jnp.concatenate(po_blocks, axis=-1))
            cum += cs
        t_blocks.append(jnp.concatenate(in_rows, axis=1))
    return jnp.stack(t_blocks, axis=1)


def pack_downsample_kernel(w: Array) -> Array:
    """[3, 3, Cin, Cout] stride-2 pad-1 conv, packed input → UNPACKED
    output: [3, 2, P*Cin, Cout], to be applied with stride (2, 1) and
    padding ((1, 1), (1, 0)).  (The output pixel grid is the even pixels,
    which map 1:1 onto packed cells.)"""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    z = jnp.zeros((kh, cin, cout), w.dtype)
    # out pixel 2w' reads pixels 2w'-1, 2w', 2w'+1 = cells (w'-1, p1), (w', p0), (w', p1)
    t0 = jnp.concatenate([z, w[:, 0]], axis=1)
    t1 = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)
    return jnp.stack([t0, t1], axis=1)


def pack_upsample_kernel(w: Array) -> Array:
    """[3, 3, Cin, Cout] conv applied after a 2x nearest upsample →
    [3, 3, Cin, P*Cout] kernel applied to the H-duplicated (but NOT
    W-upsampled) input, emitting a W-PACKED output directly.

    Nearest W-upsample means output pixel ``2w+po`` reads original pixels
    {w-1, w} (po=0: taps k0 | k1+k2) or {w, w+1} (po=1: taps k0+k1 | k2),
    so both output parities fit one width-3 conv over the ORIGINAL cell
    grid — same MAC count as the true post-upsample conv, full output
    lanes, and the ``upsample → pack`` relayout disappears.  Output
    channels are parity-major ([p0-block, p1-block]), matching the packed
    channel order of ``pack``/``_slot_map``.  The vertical upsample stays
    a row duplication of the input (half the copy bytes of the full 2x2
    nearest materialization)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    z = jnp.zeros((kh, cin, cout), w.dtype)
    t0 = jnp.concatenate([w[:, 0], z], axis=-1)
    t1 = jnp.concatenate([w[:, 1] + w[:, 2], w[:, 0] + w[:, 1]], axis=-1)
    t2 = jnp.concatenate([z, w[:, 2]], axis=-1)
    return jnp.stack([t0, t1, t2], axis=1)


def packed_upsample_conv(
    x: Array, w: Array, bias: Optional[Array], dtype=None
) -> Array:
    """2x nearest upsample + 3x3 SAME conv from canonical weights:
    UNPACKED [B, H, W, Cin] input → PACKED [B, 2H, W, P*Cout] output."""
    dtype = dtype or x.dtype
    b, h, w_, c = x.shape
    u = jnp.broadcast_to(x[:, :, None], (b, h, P, w_, c)).reshape(
        b, h * P, w_, c
    )
    wp = pack_upsample_kernel(w).astype(dtype)
    dn = jax.lax.conv_dimension_numbers(u.shape, wp.shape, _DN)
    out = jax.lax.conv_general_dilated(
        u.astype(dtype), wp, (1, 1), "SAME", dimension_numbers=dn
    )
    if bias is not None:
        out = out + tile_channel_param(bias).astype(dtype)
    return out


def tile_channel_param(v: Optional[Array]) -> Optional[Array]:
    """Per-true-channel vector → per-packed-slot vector (parity-major)."""
    if v is None:
        return None
    return jnp.tile(v, P)


_DN = ("NHWC", "HWIO", "NHWC")


def packed_conv(
    x: Array,
    w: Array,
    bias: Optional[Array],
    src_channels: Sequence[int],
    dtype=None,
) -> Array:
    """Stride-1 SAME conv on a packed tensor from canonical weights."""
    dtype = dtype or x.dtype
    wp = pack_conv_kernel(w, src_channels).astype(dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, wp.shape, _DN)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), wp, (1, 1), "SAME", dimension_numbers=dn
    )
    if bias is not None:
        out = out + tile_channel_param(bias).astype(dtype)
    return out


def packed_downsample_conv(
    x: Array, w: Array, bias: Optional[Array], dtype=None
) -> Array:
    """Stride-2 pad-1 downsample conv: packed input, UNPACKED output."""
    dtype = dtype or x.dtype
    wp = pack_downsample_kernel(w).astype(dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, wp.shape, _DN)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), wp, (2, 1), ((1, 1), (1, 0)), dimension_numbers=dn
    )
    if bias is not None:
        out = out + bias.astype(dtype)
    return out
