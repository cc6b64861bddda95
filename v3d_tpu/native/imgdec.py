"""ctypes wrapper for the native image decoder (imgdec.cc): libpng/libjpeg
decode with a std::thread batch fan-out — the TPU-side stand-in for the
decode parallelism the reference gets from torch DataLoader workers
(sgm/data/video_dataset.py num_workers et al.).

Every entry point returns None / falls back cleanly when the toolchain or
the image libraries are missing, so PIL paths keep working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libimgdec.so")
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int)


def _build() -> bool:
    src = os.path.join(_DIR, "imgdec.cc")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
             "-o", _LIB_PATH, "-lpng16", "-ljpeg", "-pthread"],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native imgdec build failed ({e}); using PIL fallback")
        return False


def load_imgdec() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"native imgdec load failed ({e}); using PIL fallback")
        _lib_failed = True
        return None
    lib.imgdec_probe.restype = ctypes.c_int
    lib.imgdec_probe.argtypes = [_u8p, ctypes.c_int64, _i32p, _i32p]
    lib.imgdec_decode.restype = ctypes.c_int
    lib.imgdec_decode.argtypes = [_u8p, ctypes.c_int64, _u8p,
                                  ctypes.c_int64, _i32p, _i32p]
    lib.imgdec_decode_batch.restype = ctypes.c_int
    lib.imgdec_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, _u8p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, _i32p]
    _lib = lib
    return lib


def decode_image(src: Union[str, bytes]) -> Optional[np.ndarray]:
    """Decode one PNG/JPEG (path or bytes) -> (h, w, 4) uint8 RGBA, or None
    when the native lib is unavailable / the data is not decodable."""
    lib = load_imgdec()
    if lib is None:
        return None
    if isinstance(src, str):
        try:
            with open(src, "rb") as f:
                src = f.read()
        except OSError:
            return None
    buf = np.frombuffer(src, np.uint8)
    data = buf.ctypes.data_as(_u8p)
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.imgdec_probe(data, buf.size, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = lib.imgdec_decode(data, buf.size, out.ctypes.data_as(_u8p),
                           out.nbytes, ctypes.byref(w), ctypes.byref(h))
    return out if rc == 0 else None


def decode_batch(paths: Sequence[str], size: Tuple[int, int],
                 threads: int = 0) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Threaded decode of same-size files -> ((n, h, w, 4) uint8, ok (n,)
    bool).  ``size`` is (h, w); items that fail or mismatch have ok=False
    (their pixels are undefined).  threads=0 -> one per CPU."""
    lib = load_imgdec()
    if lib is None:
        return None
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w, 4), np.uint8)
    rcs = np.zeros(n, np.int32)
    if threads <= 0:
        threads = len(os.sched_getaffinity(0))
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.imgdec_decode_batch(arr, n, out.ctypes.data_as(_u8p), w, h,
                            threads, rcs.ctypes.data_as(_i32p))
    return out, rcs == 0


def load_rgba(path: str) -> np.ndarray:
    """RGBA uint8 via the native decoder, PIL fallback otherwise."""
    out = decode_image(path)
    if out is not None:
        return out
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"))
