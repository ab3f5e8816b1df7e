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
