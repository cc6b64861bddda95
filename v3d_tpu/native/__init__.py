"""Native (C++) components, loaded via ctypes.

Build on first use (g++ is in the image); every native path has a pure-numpy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmtets.so")
_lib = None


def _build() -> bool:
    src = os.path.join(_DIR, "marching_tets.cc")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
             "-o", _LIB_PATH], check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed ({e}); using numpy fallback")
        return False


def load_mtets() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mtets_run.restype = ctypes.c_int
    lib.mtets_run.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mtets_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def marching_tets_native(sdf: np.ndarray, level: float = 0.0
                         ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ marching tetrahedra; returns None if the lib is unavailable.
    ``sdf``: (nx, ny, nz) float32 -> (verts in index space, faces)."""
    lib = load_mtets()
    if lib is None:
        return None
    sdf = np.ascontiguousarray(sdf, np.float32)
    nx, ny, nz = sdf.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.mtets_run(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        ctypes.c_float(level), ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(faces_p), ctypes.byref(nf))
    if rc != 0:
        return None
    verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
    faces = np.ctypeslib.as_array(faces_p, shape=(nf.value, 3)).copy()
    lib.mtets_free(verts_p)
    lib.mtets_free(faces_p)
    return verts, faces
