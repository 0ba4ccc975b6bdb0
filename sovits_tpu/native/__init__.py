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


_WORLD_LIB_PATH = _HERE / "libworld_f0.so"
_world_lib = None
_world_tried = False


def _load_world():
    global _world_lib, _world_tried
    if _world_lib is not None or _world_tried:
        return _world_lib
    _world_tried = True
    if not _WORLD_LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_HERE)], check=True, capture_output=True, timeout=180
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_WORLD_LIB_PATH))
        dbl_p = ctypes.POINTER(ctypes.c_double)
        lib.world_dio_f0_length.argtypes = [ctypes.c_int64, ctypes.c_double, ctypes.c_double]
        lib.world_dio_f0_length.restype = ctypes.c_int
        lib.world_dio.argtypes = [
            dbl_p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            dbl_p, dbl_p,
        ]
        lib.world_dio.restype = None
        lib.world_stonemask.argtypes = [
            dbl_p, ctypes.c_int64, ctypes.c_double, dbl_p, dbl_p,
            ctypes.c_int64, dbl_p,
        ]
        lib.world_stonemask.restype = None
        lib.world_band_candidates.argtypes = [
            dbl_p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, dbl_p, ctypes.c_int64,
            dbl_p, dbl_p,
        ]
        lib.world_band_candidates.restype = None
        flt_p = ctypes.POINTER(ctypes.c_float)
        lib.world_band_candidates_f.argtypes = [
            flt_p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, dbl_p, ctypes.c_int64,
            dbl_p, dbl_p,
        ]
        lib.world_band_candidates_f.restype = None
        lib.world_harvest_band_candidates.argtypes = [
            dbl_p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, dbl_p,
            ctypes.c_int64, dbl_p,
        ]
        lib.world_harvest_band_candidates.restype = None
        try:  # round-5 symbols: a stale prebuilt .so may lack them
            i64_p = ctypes.POINTER(ctypes.c_int64)
            multi_sig = [
                dbl_p, ctypes.c_int64, ctypes.c_int64, i64_p,
                ctypes.c_int64, ctypes.c_double, dbl_p, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, dbl_p, ctypes.c_int64,
                dbl_p,
            ]
            lib.world_harvest_band_candidates_multi.argtypes = multi_sig
            lib.world_harvest_band_candidates_multi.restype = None
            lib.world_harvest_band_candidates_multi_f.argtypes = (
                [flt_p] + multi_sig[1:]
            )
            lib.world_harvest_band_candidates_multi_f.restype = None
        except AttributeError:
            pass
        lib.world_harvest_remove_unreliable.argtypes = [
            dbl_p, dbl_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ]
        lib.world_harvest_remove_unreliable.restype = None
        lib.world_fix_steps.argtypes = [
            dbl_p, dbl_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, dbl_p,
        ]
        lib.world_fix_steps.restype = None
        lib.world_refine_f0.argtypes = [
            dbl_p, ctypes.c_int64, ctypes.c_double, dbl_p, dbl_p,
            ctypes.c_int64, dbl_p, dbl_p,
        ]
        lib.world_refine_f0.restype = None
        lib.world_fir_decimate.argtypes = [
            dbl_p, ctypes.c_int64, dbl_p, ctypes.c_int64, ctypes.c_int64,
            dbl_p, ctypes.c_int64,
        ]
        lib.world_fir_decimate.restype = None
        lib.world_fir_decimate_f.argtypes = [
            flt_p, ctypes.c_int64, flt_p, ctypes.c_int64, ctypes.c_int64,
            flt_p, ctypes.c_int64,
        ]
        lib.world_fir_decimate_f.restype = None
        _world_lib = lib
    except OSError:
        _world_lib = None
    return _world_lib


def world_available() -> bool:
    return _load_world() is not None


def world_dio(x: np.ndarray, fs: float, frame_period: float = 5.0,
              f0_floor: float = 71.0, f0_ceil: float = 800.0,
              channels_in_octave: float = 2.0, allowed_range: float = 0.1):
    """Native WORLD DIO (world_f0.cpp). Returns (temporal_positions, f0)."""
    lib = _load_world()
    if lib is None:
        raise RuntimeError("native world_f0 library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = lib.world_dio_f0_length(len(x), float(fs), float(frame_period))
    tpos = np.empty(n, np.float64)
    f0 = np.empty(n, np.float64)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.world_dio(
        x.ctypes.data_as(dbl_p), len(x), float(fs), float(frame_period),
        float(f0_floor), float(f0_ceil), float(channels_in_octave),
        float(allowed_range),
        tpos.ctypes.data_as(dbl_p), f0.ctypes.data_as(dbl_p),
    )
    return tpos, f0


def world_band_candidates(
    filtered: np.ndarray, fs: float, boundary_f0: float, f0_floor: float,
    f0_ceil: float, temporal_positions: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Event tracks + interpolation + candidate/score for one filtered band
    (the loop-heavy middle of DIO). Returns (candidate, score) per frame."""
    lib = _load_world()
    if lib is None:
        raise RuntimeError("native world_f0 library unavailable")
    if filtered.dtype != np.float32:
        filtered = np.ascontiguousarray(filtered, dtype=np.float64)
    else:
        filtered = np.ascontiguousarray(filtered)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    cand = np.empty(len(tpos), np.float64)
    score = np.empty(len(tpos), np.float64)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    fn = (lib.world_band_candidates_f if filtered.dtype == np.float32
          else lib.world_band_candidates)
    in_p = (ctypes.POINTER(ctypes.c_float) if filtered.dtype == np.float32
            else dbl_p)
    fn(
        filtered.ctypes.data_as(in_p), len(filtered), float(fs),
        float(boundary_f0), float(f0_floor), float(f0_ceil),
        tpos.ctypes.data_as(dbl_p), len(tpos),
        cand.ctypes.data_as(dbl_p), score.ctypes.data_as(dbl_p),
    )
    return cand, score


def world_harvest_band_candidates(
    filtered: np.ndarray, fs: float, boundary_f0: float, f0_floor: float,
    f0_ceil: float, track_agreement: float, temporal_positions: np.ndarray,
) -> np.ndarray:
    """Harvest raw candidate contour for one band-filtered channel."""
    lib = _load_world()
    if lib is None:
        raise RuntimeError("native world_f0 library unavailable")
    filtered = np.ascontiguousarray(filtered, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    cand = np.empty(len(tpos), np.float64)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.world_harvest_band_candidates(
        filtered.ctypes.data_as(dbl_p), len(filtered), float(fs),
        float(boundary_f0), float(f0_floor), float(f0_ceil),
        float(track_agreement), tpos.ctypes.data_as(dbl_p), len(tpos),
        cand.ctypes.data_as(dbl_p),
    )
    return cand


def world_harvest_band_candidates_multi(
    filt: np.ndarray, offsets: np.ndarray, y_length: int, fs: float,
    boundary_f0s: np.ndarray, f0_floor: float, f0_ceil: float,
    track_agreement: float, temporal_positions: np.ndarray,
) -> np.ndarray:
    """Whole-chunk Harvest band candidates: channel ch reads
    ``filt[ch, offsets[ch] : offsets[ch] + y_length]``. One ctypes crossing
    for the whole chunk instead of one per channel."""
    lib = _load_world()
    if lib is None or not hasattr(lib, "world_harvest_band_candidates_multi"):
        raise RuntimeError("native world_f0 multi entry unavailable")
    if filt.dtype == np.float32:
        filt = np.ascontiguousarray(filt)  # no f64 staging copy
        fn = lib.world_harvest_band_candidates_multi_f
        in_p = ctypes.POINTER(ctypes.c_float)
    else:
        filt = np.ascontiguousarray(filt, dtype=np.float64)
        fn = lib.world_harvest_band_candidates_multi
        in_p = ctypes.POINTER(ctypes.c_double)
    n_ch = filt.shape[0]
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    bnds = np.ascontiguousarray(boundary_f0s, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    cand = np.empty((n_ch, len(tpos)), np.float64)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    i64_p = ctypes.POINTER(ctypes.c_int64)
    fn(
        filt.ctypes.data_as(in_p), n_ch, filt.shape[1],
        offs.ctypes.data_as(i64_p), y_length, float(fs),
        bnds.ctypes.data_as(dbl_p), float(f0_floor), float(f0_ceil),
        float(track_agreement), tpos.ctypes.data_as(dbl_p), len(tpos),
        cand.ctypes.data_as(dbl_p),
    )
    return cand


def world_harvest_remove_unreliable(
    cands: np.ndarray, scores: np.ndarray, threshold: float
) -> None:
    """Harvest stage 7 IN PLACE (numpy oracle: world_harvest.py
    _remove_unreliable): drop candidates without a close neighbour-frame
    candidate. cands/scores: [n_frames, k] float64, C-contiguous."""
    lib = _load_world()
    if lib is None:
        raise RuntimeError("native world_f0 library unavailable")
    assert cands.dtype == np.float64 and cands.flags.c_contiguous
    assert scores.dtype == np.float64 and scores.flags.c_contiguous
    n_frames, k = cands.shape
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.world_harvest_remove_unreliable(
        cands.ctypes.data_as(dbl_p), scores.ctypes.data_as(dbl_p),
        n_frames, k, float(threshold),
    )


def world_fix_steps(best: np.ndarray, candidates: np.ndarray,
                    frame_period_ms: float, f0_floor: float,
                    allowed_range: float) -> np.ndarray:
    """The four DIO contour-fixing passes (candidates: [n_bands, n_frames])."""
    lib = _load_world()
    if lib is None:
        raise RuntimeError("native world_f0 library unavailable")
    best = np.ascontiguousarray(best, dtype=np.float64)
    candidates = np.ascontiguousarray(candidates, dtype=np.float64)
    out = np.empty_like(best)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.world_fix_steps(
        best.ctypes.data_as(dbl_p), candidates.ctypes.data_as(dbl_p),
        candidates.shape[0], candidates.shape[1], float(frame_period_ms),
        float(f0_floor), float(allowed_range), out.ctypes.data_as(dbl_p),
    )
    return out


def world_refine_f0(x: np.ndarray, fs: float, positions: np.ndarray,
                    f0s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Harvest candidate refinement: (refined f0, reliability score) per
    (position, f0) pair, via harmonic instantaneous frequency."""
    lib = _load_world()
    if lib is None:
        raise RuntimeError("native world_f0 library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float64)
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    f0s = np.ascontiguousarray(f0s, dtype=np.float64)
    refined = np.empty_like(f0s)
    score = np.empty_like(f0s)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.world_refine_f0(
        x.ctypes.data_as(dbl_p), len(x), float(fs),
        positions.ctypes.data_as(dbl_p), f0s.ctypes.data_as(dbl_p), len(f0s),
        refined.ctypes.data_as(dbl_p), score.ctypes.data_as(dbl_p),
    )
    return refined, score


_FIR_CACHE: dict[int, np.ndarray] = {}


def _decimation_fir(ratio: int) -> np.ndarray:
    """Linear-phase Kaiser lowpass at WORLD's decimate cutoff (0.8·nyq/ratio).

    beta=8 gives ~81 dB stopband; the length follows the Kaiser formula for
    the 0.2·nyq/ratio transition band, rounded odd so the center tap sits on
    a sample and the polyphase output is exactly zero-phase."""
    h = _FIR_CACHE.get(ratio)
    if h is None:
        from scipy import signal as sps

        width = 0.2 / ratio  # transition band, in nyquist units
        ntaps = int(np.ceil((8.0 / 0.1102 + 7.95) / (14.36 * width / 2.0)))
        ntaps += 1 - ntaps % 2
        h = sps.firwin(ntaps, 0.9 / ratio, window=("kaiser", 8.0))
        _FIR_CACHE[ratio] = h
    return h


def fir_decimate(x: np.ndarray, ratio: int, dtype=np.float32) -> np.ndarray:
    """Zero-phase polyphase FIR decimation: y[m] = (h * x)[m*ratio], h the
    cached Kaiser lowpass, centered, zero-padded edges. The predictor fast
    path's substitute for MATLAB-style `decimate` (world_dio.decimate is the
    filtfilt oracle); same output length as x[::ratio]. ``dtype=float32``
    (default) runs the 4-way-blocked SIMD kernel (~1e-5-relative rounding);
    ``float64`` the full-precision one. Returns float64 either way."""
    if ratio <= 1:
        return np.asarray(x, np.float64).copy()
    h = _decimation_fir(ratio)
    n_out = -(-len(x) // ratio)
    lib = _load_world()
    if lib is None:  # numpy fallback (correctness only)
        x = np.asarray(x, np.float64)
        half = len(h) // 2
        xe = np.pad(x, (half, half + ratio * n_out - len(x)))
        acc = np.zeros(n_out, np.float64)
        for k, hk in enumerate(h):
            acc += hk * xe[k : k + n_out * ratio : ratio]
        return acc
    if dtype == np.float32:
        # straight to f32 (no f64 staging copy: a 10 s 44.1 kHz clip would
        # pay two extra 3.5 MB passes per call)
        xf = np.ascontiguousarray(x, dtype=np.float32)
        hf = np.ascontiguousarray(h, dtype=np.float32)
        out = np.empty(n_out, np.float32)
        flt_p = ctypes.POINTER(ctypes.c_float)
        lib.world_fir_decimate_f(
            xf.ctypes.data_as(flt_p), len(xf), hf.ctypes.data_as(flt_p),
            len(hf), ratio, out.ctypes.data_as(flt_p), n_out,
        )
        return out.astype(np.float64)
    xd = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty(n_out, np.float64)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.world_fir_decimate(
        xd.ctypes.data_as(dbl_p), len(xd), h.ctypes.data_as(dbl_p), len(h),
        ratio, out.ctypes.data_as(dbl_p), n_out,
    )
    return out


def world_stonemask(x: np.ndarray, fs: float, temporal_positions: np.ndarray,
                    f0: np.ndarray) -> np.ndarray:
    lib = _load_world()
    if lib is None:
        raise RuntimeError("native world_f0 library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float64)
    tpos = np.ascontiguousarray(temporal_positions, dtype=np.float64)
    f0 = np.ascontiguousarray(f0, dtype=np.float64)
    out = np.empty_like(f0)
    dbl_p = ctypes.POINTER(ctypes.c_double)
    lib.world_stonemask(
        x.ctypes.data_as(dbl_p), len(x), float(fs),
        tpos.ctypes.data_as(dbl_p), f0.ctypes.data_as(dbl_p), len(f0),
        out.ctypes.data_as(dbl_p),
    )
    return out
