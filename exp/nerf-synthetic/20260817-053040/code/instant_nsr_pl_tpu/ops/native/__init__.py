"""Native (C++) fast paths, loaded via ctypes.

The reference delegates its heavy non-TPU-suitable work to native libraries
(torchmcubes/PyMCubes, reference requirements.txt:9); here the equivalents are
built from the C++ sources in this directory with g++ at first import and
cached next to them. Every native entry point has a pure-numpy twin used as
the fallback (and as the correctness reference in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    """Compile marching_tet.cc into a shared library (cached) and load it."""
    src = os.path.join(_DIR, "marching_tet.cc")
    lib_path = os.path.join(_DIR, "_native.so")
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
        tmp = lib_path + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, lib_path)
    lib = ctypes.CDLL(lib_path)
    lib.mt_run.restype = ctypes.c_void_p
    lib.mt_run.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float,
    ]
    lib.mt_counts.restype = None
    lib.mt_counts.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mt_fetch.restype = None
    lib.mt_fetch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mt_free.restype = None
    lib.mt_free.argtypes = [ctypes.c_void_p]
    return lib


def _get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB = None
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def marching_tetrahedra_native(values, iso=0.0):
    """C++ marching tetrahedra; same contract as ops.isosurface.marching_tetrahedra."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    values = np.ascontiguousarray(values, dtype=np.float32)
    rx, ry, rz = values.shape
    handle = lib.mt_run(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rx, ry, rz, ctypes.c_float(float(iso)),
    )
    try:
        nv = ctypes.c_int64()
        nf = ctypes.c_int64()
        lib.mt_counts(handle, ctypes.byref(nv), ctypes.byref(nf))
        verts = np.empty((nv.value, 3), np.float32)
        faces = np.empty((nf.value, 3), np.int64)
        if nv.value or nf.value:
            lib.mt_fetch(
                handle,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
    finally:
        lib.mt_free(handle)
    return verts, faces
