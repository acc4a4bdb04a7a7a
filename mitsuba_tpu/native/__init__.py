"""Native (C++) performance tier, loaded through ctypes.

The reference implements its hot host-side machinery natively (kd-tree
builder gkdtree.h, stream/scheduler core). This package compiles the C++
sources on first use with the system toolchain (g++ -O3) and caches the
shared object next to the sources; every native entry point has a pure
numpy fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmtpu_native.so")
_SOURCES = [os.path.join(_HERE, "bvh.cpp")]

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared", "-pthread",
        *_SOURCES, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        newest_src = max(os.path.getmtime(s) for s in _SOURCES)
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < newest_src:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.mtpu_build_bvh.restype = ctypes.c_int64
        lib.mtpu_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def build_bvh_native(prim_lo: np.ndarray, prim_hi: np.ndarray, leaf_size: int):
    """C++ binned-SAH build; returns the accel.build.BVH tuple or None."""
    lib = get_lib()
    if lib is None:
        return None
    T = prim_lo.shape[0]
    lo = np.ascontiguousarray(prim_lo, np.float32)
    hi = np.ascontiguousarray(prim_hi, np.float32)
    cap = 2 * T + 16
    out_lo = np.empty((cap, 3), np.float32)
    out_hi = np.empty((cap, 3), np.float32)
    out_skip = np.empty(cap, np.int32)
    out_first = np.empty(cap, np.int32)
    out_count = np.empty(cap, np.int32)
    out_order = np.empty(T, np.int32)

    def fp(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    n = lib.mtpu_build_bvh(
        fp(lo), fp(hi), ctypes.c_int64(T), ctypes.c_int32(leaf_size),
        fp(out_lo), fp(out_hi), ip(out_skip), ip(out_first), ip(out_count),
        ip(out_order),
    )
    if n <= 0:
        return None
    from ..accel.build import BVH

    return BVH(
        lo=out_lo[:n].copy(), hi=out_hi[:n].copy(), skip=out_skip[:n].copy(),
        prim_first=out_first[:n].copy(), prim_count=out_count[:n].copy(),
        prim_order=out_order,
    )
