"""ctypes bindings to the native C++ runtime library (libmcmh_native.so).

The reference's only compiled layer is Numba ``@njit`` (parallel_utils.py);
our compute path is JAX/XLA/Pallas, and this module covers the *host-side*
runtime pieces that benefit from native code: exact Felzenszwalb EDT for the
one-time per-map distance-field precompute, and PGM raster decoding.

Build with ``make -C native`` (see native/Makefile); all callers fall back to
pure-Python/JAX implementations when the library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libmcmh_native.so"),
    os.path.join(os.path.dirname(__file__), "libmcmh_native.so"),
]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            _LIB = ctypes.CDLL(p)
            break
    if _LIB is None:
        raise ImportError(
            "libmcmh_native.so not built; run `make -C native` or use a "
            "non-native implementation"
        )
    _LIB.mcmh_edt.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    _LIB.mcmh_edt.restype = None
    return _LIB


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def edt(occupied: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance (cells) to nearest True cell, Felzenszwalb O(n).

    Matches scipy.ndimage.distance_transform_edt(~occupied)."""
    lib = _load()
    occ = np.ascontiguousarray(occupied, dtype=np.uint8)
    h, w = occ.shape
    out = np.empty((h, w), dtype=np.float32)
    lib.mcmh_edt(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(h),
        ctypes.c_int(w),
    )
    return out
