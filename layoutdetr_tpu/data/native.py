"""ctypes bindings for the native data-loading core (native/fastdata.cpp).

Builds the shared library on demand (g++ -O3, cached next to the
source) and exposes:
- ``decode_png(bytes) -> uint8 [H, W, 3]``
- ``resize_lanczos(img, size) -> uint8 [size, size, 3]``
- ``load_background(bytes, size) -> float32 [size, size, 3]`` (fused
  decode + Lanczos resize + ImageNet normalize)

``available()`` gates use; every caller keeps a PIL fallback so the
framework works without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastdata.cpp")
_SO = os.path.join(_NATIVE_DIR, "libfastdata.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fd_decode_png.restype = ctypes.c_int
        lib.fd_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.fd_resize_lanczos.restype = ctypes.c_int
        lib.fd_resize_lanczos.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.fd_load_background.restype = ctypes.c_int
        lib.fd_load_background.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_MAX_SIDE = 4096


def decode_png(data: bytes) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty(_MAX_SIDE * _MAX_SIDE * 3, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.fd_decode_png(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        raise ValueError(f"fd_decode_png failed: {rc}")
    return out[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def resize_lanczos(img: np.ndarray, size: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((size, size, 3), np.uint8)
    lib.fd_resize_lanczos(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[1], img.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size, size,
    )
    return out


def load_background(data: bytes, size: int) -> np.ndarray:
    """PNG bytes -> ImageNet-normalized float32 [size, size, 3]."""
    lib = _load()
    assert lib is not None
    dst = np.empty((size, size, 3), np.float32)
    scratch = np.empty(_MAX_SIDE * _MAX_SIDE * 3, np.uint8)
    rc = lib.fd_load_background(
        data, len(data), size,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), scratch.size,
    )
    if rc != 0:
        raise ValueError(f"fd_load_background failed: {rc}")
    return dst
