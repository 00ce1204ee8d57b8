"""Image conversion / grid helpers.

Counterparts of the reference's visualization utilities
(``utils_Img2Img.py:96-176`` — ``tensor_to_PIL`` with per-channel or
global min-max normalization, ``print_grid``), operating on NHWC numpy/JAX
arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def to_pil(
    images,  # [B,H,W,C] or [H,W,C], any float range or uint8
    normalize: str = "clip",  # "clip" ([-1,1]→[0,1]), "minmax", "channel_minmax"
) -> List[Image.Image]:
    arr = np.asarray(images)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.dtype == np.uint8:
        scaled = arr.astype(np.float32) / 255.0
    elif normalize == "clip":
        scaled = np.clip(arr / 2.0 + 0.5, 0.0, 1.0)
    elif normalize == "minmax":
        lo = arr.min(axis=(1, 2, 3), keepdims=True)
        hi = arr.max(axis=(1, 2, 3), keepdims=True)
        scaled = (arr - lo) / np.maximum(hi - lo, 1e-12)
    elif normalize == "channel_minmax":
        lo = arr.min(axis=(1, 2), keepdims=True)
        hi = arr.max(axis=(1, 2), keepdims=True)
        scaled = (arr - lo) / np.maximum(hi - lo, 1e-12)
    else:
        raise ValueError(f"unknown normalize mode: {normalize}")
    out = []
    for img in (scaled * 255).astype(np.uint8):
        if img.shape[-1] == 1:
            img = img[..., 0]
        out.append(Image.fromarray(img))
    return out


def latents_to_grayscale(latents) -> np.ndarray:
    """Channel-mean + min-max per sample → [B,H,W,1] in [0,1] — how the
    reference visualizes SD latents (utils_training.py:859-876)."""
    arr = np.asarray(latents, dtype=np.float32).mean(axis=-1, keepdims=True)
    lo = arr.min(axis=(1, 2, 3), keepdims=True)
    hi = arr.max(axis=(1, 2, 3), keepdims=True)
    return (arr - lo) / np.maximum(hi - lo, 1e-12)


def image_grid(
    images, cols: Optional[int] = None, normalize: str = "clip"
) -> Image.Image:
    """Tile a batch into one grid image."""
    pils = to_pil(images, normalize)
    n = len(pils)
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    w, h = pils[0].size
    grid = Image.new("RGB", (cols * w, rows * h))
    for i, img in enumerate(pils):
        grid.paste(img.convert("RGB"), ((i % cols) * w, (i // cols) * h))
    return grid


def side_by_side(
    originals, transferred, normalize: str = "clip"
) -> Image.Image:
    """Pairs panel: row i = (original_i, transferred_i) — the reference's
    orig/transferred wandb Table (utils_Img2Img.py:402-452)."""
    a = to_pil(originals, normalize)
    b = to_pil(transferred, normalize)
    w, h = a[0].size
    grid = Image.new("RGB", (2 * w, len(a) * h))
    for i, (o, t) in enumerate(zip(a, b)):
        grid.paste(o.convert("RGB"), (0, i * h))
        grid.paste(t.convert("RGB"), (w, i * h))
    return grid
