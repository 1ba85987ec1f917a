"""ctypes loader for the native C++ runtime library (native/rt_native.cpp).

The TPU owns the compute path; this library accelerates host-side hot
spots (BVH builds, PNG scanline codecs). Compiled on demand with g++ and
cached next to the source; every entry point has a pure-Python fallback,
so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "rt_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "librt_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

        lib.rt_build_bvh.restype = ctypes.c_int32
        lib.rt_build_bvh.argtypes = [
            f32p, f32p, ctypes.c_int32, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p, i32p]

        lib.rt_png_unfilter.restype = ctypes.c_int32
        lib.rt_png_unfilter.argtypes = [
            u8p, u8p, u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]

        lib.rt_png_filter_paeth.restype = None
        lib.rt_png_filter_paeth.argtypes = [
            u8p, u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]

        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def build_bvh_native(lo: np.ndarray, hi: np.ndarray, leaf_size: int = 4):
    """Native BVH build -> flat arrays, or None if the library is absent.

    Same DFS + skip-pointer layout (and, given identical float centroids,
    identical topology) as the Python builder in bvh.py.
    """
    lib = load()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = lo.shape[0]
    if n == 0:
        return None
    cap = 2 * n
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_skip = np.empty(cap, np.int32)
    node_first = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    prim_index = np.empty(n, np.int32)
    n_nodes = lib.rt_build_bvh(lo.reshape(-1), hi.reshape(-1), n,
                               leaf_size, node_min.reshape(-1),
                               node_max.reshape(-1), node_skip,
                               node_first, node_count, prim_index)
    return (node_min[:n_nodes], node_max[:n_nodes], node_skip[:n_nodes],
            node_first[:n_nodes], node_count[:n_nodes], prim_index)


def png_unfilter_native(filters: np.ndarray, data: np.ndarray,
                        bpp: int) -> Optional[np.ndarray]:
    """Native PNG scanline unfiltering; None if unavailable or a bad
    filter byte is found (caller falls back / errors)."""
    lib = load()
    if lib is None:
        return None
    filters = np.ascontiguousarray(filters, np.uint8)
    data = np.ascontiguousarray(data, np.uint8)
    h, stride = data.shape
    out = np.empty_like(data)
    rc = lib.rt_png_unfilter(filters, data, out, h, stride, bpp)
    if rc != 0:
        raise ValueError(f"unknown PNG filter {rc}")
    return out


def png_filter_paeth_native(data: np.ndarray,
                            bpp: int) -> Optional[np.ndarray]:
    """Paeth-filter scanlines for encoding; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    h, stride = data.shape
    out = np.empty((h, stride + 1), np.uint8)
    lib.rt_png_filter_paeth(data, out, h, stride, bpp)
    return out
