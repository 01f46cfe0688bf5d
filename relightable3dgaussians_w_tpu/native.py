"""ctypes loader for the native C++ runtime components (native/src/r3dgw_native.cpp).

The native library accelerates host-side hot paths (COLMAP points3D parsing at
Trevi scale, 3-NN scale initialization). Every entry point has a pure-python
fallback, so the framework works without compilation; `ensure_built()` compiles it
on demand with the repo's Makefile (g++ is part of the baked toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libr3dgw_native.so")
_lib = None
_tried = False


def ensure_built(quiet: bool = True) -> bool:
    """Build the shared library if missing. Returns True when available."""
    if os.path.exists(_LIB_PATH):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.colmap_count_points3d.restype = ctypes.c_longlong
    lib.colmap_count_points3d.argtypes = [ctypes.c_char_p]
    lib.colmap_read_points3d.restype = ctypes.c_longlong
    lib.colmap_read_points3d.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_longlong,
    ]
    lib.knn_mean_dist2.restype = ctypes.c_int
    lib.knn_mean_dist2.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_longlong, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return _lib


def read_points3d_binary_native(path: str):
    """Native points3D.bin parser; returns (xyz, rgb, err) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.colmap_count_points3d(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    got = lib.colmap_read_points3d(path.encode(), xyz, rgb, err, n)
    if got != n:
        return None
    return xyz, rgb, err


def knn_mean_dist2_native(points: np.ndarray, k: int = 3):
    """Native Morton-window 3-NN; returns [n] float32 or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    if lib.knn_mean_dist2(pts, len(pts), k, out) != 0:
        return None
    return out
