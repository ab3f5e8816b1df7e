"""ctypes loader for the native host ops (hostops.cpp).

Builds ``libhostops.so`` with g++ on first import if missing; every entry
point has a numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhostops.so")
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        src = os.path.join(_DIR, "hostops.cpp")
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", src,
                            "-o", _SO], check=True, capture_output=True)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.normalize_u8.argtypes = [u8p, fp, ctypes.c_size_t, fp, fp]
        lib.remap_label_u8.argtypes = [u8p, i32p, ctypes.c_size_t]
        lib.crop_normalize_u8.argtypes = [u8p, ctypes.c_size_t, fp,
                                          ctypes.c_size_t, ctypes.c_size_t,
                                          ctypes.c_size_t, ctypes.c_size_t,
                                          fp, fp]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def normalize_u8(img: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] → ImageNet-normalized float32 (single fused pass)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if not lib:
        return ((img.astype(np.float32) / 255.0) - _MEAN) / _STD
    out = np.empty(img.shape, np.float32)
    lib.normalize_u8(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     _fptr(out), img.shape[0] * img.shape[1],
                     _fptr(_MEAN), _fptr(_STD))
    return out


def remap_label_u8(mask: np.ndarray) -> np.ndarray:
    """uint8 mask → remapped int32 (0→255, v→v-1, 254→255)."""
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    if not lib:
        out = mask.astype(np.int32) - 1
        out[mask == 0] = 255
        out[out == 254] = 255
        return out
    out = np.empty(mask.shape, np.int32)
    lib.remap_label_u8(mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                       mask.size)
    return out


def available() -> bool:
    return bool(_load())


# ---------------------------------------------------------------------------
# JPEG decode pool (jpegpool.cpp, links against the system libjpeg)
# ---------------------------------------------------------------------------
_JPEG_SO = os.path.join(_DIR, "libjpegpool.so")
_jpeg_lib = None


def _load_jpeg():
    global _jpeg_lib
    if _jpeg_lib is not None:
        return _jpeg_lib
    if not os.path.exists(_JPEG_SO):
        src = os.path.join(_DIR, "jpegpool.cpp")
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", src,
                            "-o", _JPEG_SO, "-ljpeg", "-lpthread"],
                           check=True, capture_output=True)
        except Exception:
            _jpeg_lib = False
            return _jpeg_lib
    try:
        lib = ctypes.CDLL(_JPEG_SO)
        c = ctypes
        lib.jpeg_dims.argtypes = [c.c_char_p, c.POINTER(c.c_int),
                                  c.POINTER(c.c_int)]
        lib.jpeg_decode_rgb.argtypes = [c.c_char_p,
                                        c.POINTER(c.c_uint8),
                                        c.c_int, c.c_int]
        lib.jpeg_decode_batch.argtypes = [c.POINTER(c.c_char_p), c.c_int,
                                          c.POINTER(c.POINTER(c.c_uint8)),
                                          c.POINTER(c.c_int),
                                          c.POINTER(c.c_int), c.c_int]
        _jpeg_lib = lib
    except Exception:
        _jpeg_lib = False
    return _jpeg_lib


def decode_jpeg(path: str):
    """Decode one JPEG to an RGB uint8 [H, W, 3] array via libjpeg
    (bit-identical to PIL's decode — same libjpeg, same ISLOW IDCT).
    Returns None when the native library is unavailable or decode fails
    (callers fall back to PIL)."""
    lib = _load_jpeg()
    if not lib:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.jpeg_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_rgb(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value)
    return out if rc == 0 else None


def decode_jpeg_batch(paths, nthreads: int | None = None):
    """Decode a list of JPEGs concurrently on the in-process thread pool
    (the native replacement for the reference's DataLoader worker
    processes).  Returns a list of uint8 arrays, or None on any failure
    (callers fall back to per-file PIL)."""
    lib = _load_jpeg()
    if not lib or not paths:
        return None
    n = len(paths)
    if nthreads is None:
        nthreads = min(n, os.cpu_count() or 1)
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cpaths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = []
    bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    for i, p in enumerate(paths):
        h, w = ctypes.c_int(), ctypes.c_int()
        if lib.jpeg_dims(p.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
            return None
        a = np.empty((h.value, w.value, 3), np.uint8)
        outs.append(a)
        hs[i], ws[i] = h.value, w.value
        bufs[i] = a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    fails = lib.jpeg_decode_batch(cpaths, n, bufs, hs, ws, int(nthreads))
    return outs if fails == 0 else None


def jpeg_available() -> bool:
    return bool(_load_jpeg())
