"""Native (C++) runtime components, loaded via ctypes.

Builds lazily with g++ on first use (no pybind11/pip in this image); the
shared object is cached next to the sources.  Falls back to the pure-numpy
implementations in jnerf_tpu.ops when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_NATIVE_DIR, "marching_tets.cpp")
        so = os.path.join(_NATIVE_DIR, "libjnerf_native.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.marching_tets.restype = ctypes.c_int64
            lib.marching_tets.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.mt_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            _LIB = lib
        except Exception as e:  # toolchain missing or build failure
            print(f"[jnerf_tpu.native] native build unavailable: {e}")
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def marching_tets_native(field: np.ndarray, threshold: float = 0.0):
    """C++ marching tetrahedra -> (vertices [V,3], triangles [T,3]).

    Triangle soup from the native core is welded here (same rounding as the
    numpy path so both produce identical meshes).
    """
    lib = _build_and_load()
    assert lib is not None, "native library unavailable"
    field = np.ascontiguousarray(field, np.float32)
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    n_tris = lib.marching_tets(
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        field.shape[0], field.shape[1], field.shape[2],
        ctypes.c_float(threshold), ctypes.byref(out_ptr),
    )
    if n_tris == 0:
        lib.mt_free(out_ptr)
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    soup = np.ctypeslib.as_array(out_ptr, shape=(int(n_tris) * 3, 3)).copy()
    lib.mt_free(out_ptr)

    key = np.round(soup * 1e5).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        key.view([("x", np.int64), ("y", np.int64), ("z", np.int64)]),
        return_index=True, return_inverse=True,
    )
    vertices = soup[uniq_idx]
    triangles = inv.reshape(-1, 3).astype(np.int64)
    ok = (
        (triangles[:, 0] != triangles[:, 1])
        & (triangles[:, 1] != triangles[:, 2])
        & (triangles[:, 0] != triangles[:, 2])
    )
    return vertices, triangles[ok]
