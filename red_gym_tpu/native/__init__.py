"""Native (C++) runtime components, loaded via ctypes.

Built on first use with g++ into a cached shared library; every entry point
has a pure-Python/scipy fallback so the package works without a compiler.
Current components:
  * edt_f64 — exact Euclidean distance transform for map loading
    (OpenMP-parallel Felzenszwalb-Huttenlocher), replacing scipy's EDT in
    the hot map/texture pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "edt.cpp")
_SO = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load():
    """Return the native library handle, building if needed; None if the
    toolchain is unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or \
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.edt_f64.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
            lib.edt_f64.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def edt(occ: np.ndarray, resolution: float) -> np.ndarray:
    """Distance (meters) to the nearest obstacle (zero) cell.

    occ: (H, W) array, nonzero = free.  Uses the native EDT when available,
    scipy otherwise; both are exact and agree to fp precision.
    """
    lib = load()
    if lib is None:
        from scipy.ndimage import distance_transform_edt

        return resolution * distance_transform_edt(occ)

    occ_u8 = np.ascontiguousarray(occ != 0, dtype=np.uint8)
    h, w = occ_u8.shape
    out = np.empty((h, w), dtype=np.float64)
    lib.edt_f64(occ_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                h, w, float(resolution),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
