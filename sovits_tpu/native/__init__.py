"""Native host kernels (C++ via ctypes), built on demand with a numpy fallback.

``make -C sovits_tpu/native`` builds the shared library; when it's missing,
callers fall back to the pure-numpy implementations (bit-compatible, slower).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libdio_refine.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:  # best-effort on-demand build (toolchain is available)
            subprocess.run(
                ["make", "-C", str(_HERE)], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.dio_refine_f0.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.dio_refine_f0.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def dio_refine_available() -> bool:
    return _load() is not None


def dio_refine_f0(x: np.ndarray, fs: float, f0: np.ndarray, frame_t: np.ndarray) -> np.ndarray:
    """C++ instantaneous-period refinement; returns the refined f0 copy."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native dio_refine library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float64)
    out = np.ascontiguousarray(f0, dtype=np.float64).copy()
    t = np.ascontiguousarray(frame_t, dtype=np.float64)
    lib.dio_refine_f0(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(x),
        float(fs),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(out),
    )
    return out
