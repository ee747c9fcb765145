"""Build + ctypes bindings for libcrfp_native (see preprocess.cpp).

The library is compiled on first use with g++ -O3 -fopenmp and cached next
to the source; all entry points fall back cleanly when a compiler is not
available (callers check ``native_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB = os.path.join(_HERE, "libcrfp_native.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_failed = False


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load() -> ctypes.CDLL | None:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            c = ctypes.c_int
            lib.resize_bicubic_u8.argtypes = [u8p, c, c, c, c, u8p, c, c, c]
            lib.crop_normalize_flip_f32.argtypes = [u8p, c, c, c, c, f32p, c, c, c, c, c, c, c]
            lib.fill_fovea_f32.argtypes = [f32p, c, c, c, c, i32p, c, c, f32p, f32p, c]
            _lib = lib
        except Exception as e:  # no compiler / build error -> python fallback
            print(f"crfp_native build failed ({e}); falling back to numpy/PIL")
            _failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def resize_bicubic_u8(src: np.ndarray, dh: int, dw: int, nthreads: int = 1) -> np.ndarray:
    """(T, H, W, C) uint8 -> (T, dh, dw, C) uint8, PIL-compatible bicubic.

    nthreads: OpenMP threads. Keep 1 when called from loader worker
    threads (the pool already parallelizes across samples); raise it for
    single-threaded bulk use."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    t, sh, sw, c = src.shape
    dst = np.empty((t, dh, dw, c), np.uint8)
    lib.resize_bicubic_u8(src, t, sh, sw, c, dst, dh, dw, nthreads)
    return dst


def crop_normalize_flip_f32(
    src: np.ndarray, y0: int, x0: int, ch: int, cw: int,
    hflip: bool = False, vflip: bool = False, nthreads: int = 1,
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    t, h, w, c = src.shape
    dst = np.empty((t, ch, cw, c), np.float32)
    lib.crop_normalize_flip_f32(src, t, h, w, c, dst, y0, x0, ch, cw,
                                int(hflip), int(vflip), nthreads)
    return dst


def fill_fovea_f32(gt: np.ndarray, coords: np.ndarray, fh: int, fw: int, nthreads: int = 1):
    lib = _load()
    assert lib is not None
    gt = np.ascontiguousarray(gt, np.float32)
    t, h, w, c = gt.shape
    coords = np.ascontiguousarray(coords, np.int32)
    fv = np.empty_like(gt)
    mask = np.empty((t, h, w), np.float32)
    lib.fill_fovea_f32(gt, t, h, w, c, coords, fh, fw, fv, mask, nthreads)
    return fv, mask[..., None]
