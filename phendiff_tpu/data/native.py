"""ctypes bridge to the native C++ data-loader kernels.

Builds ``native/libphendiff_native.so`` on first use (g++ available in the
image) and exposes batched resize/normalize/flip with a pure-numpy+PIL
fallback when the toolchain or library is unavailable.  See
``native/phendiff_native.cpp`` for the algorithms.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libphendiff_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    script = os.path.join(_NATIVE_DIR, "build.sh")
    if not os.path.exists(script):
        return False
    try:
        subprocess.run(
            ["bash", script], check=True, capture_output=True, timeout=120
        )
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.resize_image_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.batch_resize_f32.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.resize_image_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _as_u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_normalize(
    img: np.ndarray,  # HWC uint8
    definition: Tuple[int, int],
    *,
    normalize: bool = True,
    flip_h: bool = False,
    flip_v: bool = False,
    antialias: bool = True,
) -> np.ndarray:
    """One image → float32 [dh, dw, C] (in [-1,1] when normalize)."""
    lib = get_lib()
    dh, dw = definition
    sh, sw, ch = img.shape
    img = np.ascontiguousarray(img)
    if lib is None:
        return _fallback_resize(img, definition, normalize, flip_h, flip_v)
    out = np.empty((dh, dw, ch), dtype=np.float32)
    lib.resize_image_f32(
        _as_u8_ptr(img), sh, sw, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        int(normalize), int(flip_h), int(flip_v), int(antialias),
    )
    return out


def batch_resize_normalize(
    imgs: List[np.ndarray],
    definition: Tuple[int, int],
    *,
    normalize: bool = True,
    flips: Optional[np.ndarray] = None,  # [n, 2] int (flip_h, flip_v)
    antialias: bool = True,
) -> np.ndarray:
    """Batch of variably-sized HWC uint8 images → [n, dh, dw, C] float32."""
    lib = get_lib()
    dh, dw = definition
    n = len(imgs)
    if n == 0:
        return np.empty((0, dh, dw, 3), dtype=np.float32)
    ch = imgs[0].shape[2]
    if lib is None:
        return np.stack([
            _fallback_resize(
                im, definition, normalize,
                bool(flips[i, 0]) if flips is not None else False,
                bool(flips[i, 1]) if flips is not None else False,
            )
            for i, im in enumerate(imgs)
        ])
    imgs = [np.ascontiguousarray(im) for im in imgs]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[_as_u8_ptr(im) for im in imgs]
    )
    dims = np.array(
        [[im.shape[0], im.shape[1], im.shape[2]] for im in imgs],
        dtype=np.int32,
    )
    flips_arr = (
        np.ascontiguousarray(flips, dtype=np.int32)
        if flips is not None
        else np.zeros((n, 2), dtype=np.int32)
    )
    out = np.empty((n, dh, dw, ch), dtype=np.float32)
    lib.batch_resize_f32(
        ptrs, dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        int(normalize),
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(antialias),
    )
    return out


def resize_u8(img: np.ndarray, definition: Tuple[int, int],
              antialias: bool = True) -> np.ndarray:
    lib = get_lib()
    dh, dw = definition
    sh, sw, ch = img.shape
    if lib is None:
        f = _fallback_resize(img, definition, False, False, False)
        return np.clip(f + 0.5, 0, 255).astype(np.uint8)
    img = np.ascontiguousarray(img)
    out = np.empty((dh, dw, ch), dtype=np.uint8)
    lib.resize_image_u8(
        _as_u8_ptr(img), sh, sw, ch, _as_u8_ptr(out), dh, dw, int(antialias)
    )
    return out


def _fallback_resize(img, definition, normalize, flip_h, flip_v):
    from PIL import Image

    pil = Image.fromarray(img).resize(
        (definition[1], definition[0]), Image.BILINEAR
    )
    arr = np.asarray(pil, dtype=np.float32)
    if flip_h:
        arr = arr[:, ::-1]
    if flip_v:
        arr = arr[::-1]
    if normalize:
        arr = arr / 127.5 - 1.0
    return np.ascontiguousarray(arr)
