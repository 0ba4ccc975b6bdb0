"""DIO / Harvest F0 predictors over the faithful WORLD port.

The reference delegates to pyworld's C++ dio/stonemask and harvest
(modules/F0Predictor/DioF0Predictor.py:49-56, HarvestF0Predictor.py:46-69).
`sovits_tpu.f0.world_dio` is a step-by-step port of WORLD's published DIO +
StoneMask algorithms (numpy), mirrored in C++ in native/world_f0.cpp
(parity-tested to ~1e-10 in tests/test_native.py).

- ``dio``: WORLD DIO + StoneMask exactly as the reference calls them
  (f0_floor/f0_ceil from the predictor bounds, frame_period = hop/sr).
- ``harvest``: full port of the published Harvest pipeline (Morise 2017)
  in `sovits_tpu.f0.world_harvest`: dense 40-ch/octave candidate maps,
  instantaneous-frequency refinement with reliability scores, contour
  tracking and biquad smoothing (see that module's docstring).
"""

from __future__ import annotations

import numpy as np

from .base import F0Predictor
from .world_dio import dio as world_dio_py
from .world_dio import stonemask as world_stonemask_py


class DioF0Predictor(F0Predictor):
    """WORLD DIO + StoneMask (DioF0Predictor.py:17-74 contract).

    Default mode is the fast hybrid: native two-stage zero-phase polyphase
    decimation (fs/4 for StoneMask, fs/12 for the band analysis), scipy
    overlap-save band filtering in float32, C++ track extraction +
    candidate scoring, and the C++ direct-bin StoneMask on the fs/4 signal
    (~12 ms per 10 s 44.1 kHz clip on one IDLE host core — the canonical
    per-round in-pipeline number is bench_details.json: dio_time_s; see
    PROFILE.md "Host f0 predictors"). ``exact=True`` runs
    the pure float64 numpy speed=1 oracle path (bit-for-bit the parity
    reference used by tests/test_native.py). Measured fast-vs-exact
    deviation on the speechlike fixture
    (tests/test_f0.py::test_dio_fast_vs_exact_deviation): identical voicing
    decisions, median 0.006 Hz, p95 0.04 Hz, one frame ~10 Hz."""

    name = "dio"
    channels_in_octave = 2.0
    allowed_range = 0.1
    exact = False

    def _world(self, wav: np.ndarray):
        fs = float(self.sampling_rate)
        frame_period = 1000.0 * self.hop_length / fs
        kwargs = dict(
            f0_floor=max(self.f0_min, 40.0),
            f0_ceil=self.f0_max,
            channels_in_octave=self.channels_in_octave,
            allowed_range=self.allowed_range,
        )
        from .. import native

        fast = not self.exact and native.world_available()
        if fast:
            # two-stage zero-phase polyphase decimation (native SIMD dot
            # products; WORLD's cheby-filtfilt `decimate` is the oracle):
            # stage one to ~11 kHz feeds StoneMask (its window/DFT cost
            # drops 4x; the first 6 harmonics of any f0 <= ~900 Hz stay in
            # the passband, so the IF refinement sees the same harmonic set
            # as the full-rate oracle), stage two to ~3.7 kHz feeds the
            # band analysis — WORLD's own DioOption::speed decimation point
            # (dio.cpp decimates identically when speed>1)
            if fs > 32000:
                r1, r2 = 4, 3
            elif fs > 16000:
                r1, r2 = 2, 2
            else:
                r1, r2 = 1, max(1, int(fs / 4000.0))
            y_sm = native.fir_decimate(wav, r1)
            y_band = native.fir_decimate(y_sm, r2)
            tpos, f0 = world_dio_py(
                wav, fs, frame_period=frame_period,
                filter_dtype=np.float32, native_candidates=True,
                pre_decimated=(y_band, fs / (r1 * r2)), **kwargs,
            )
            return tpos, native.world_stonemask(y_sm, fs / r1, tpos, f0)
        # exact oracle: speed=1 fp64, as the reference's pyworld call; the
        # no-native fast fallback keeps WORLD's speed decimation + f32
        speed = 1 if self.exact else max(1, min(12, int(fs / 4000.0)))
        tpos, f0 = world_dio_py(
            wav, fs, frame_period=frame_period,
            filter_dtype=np.float64 if self.exact else np.float32,
            native_candidates=False, speed=speed, **kwargs,
        )
        return tpos, world_stonemask_py(wav, fs, tpos, f0)

    def raw_f0(self, wav: np.ndarray, p_len: int) -> np.ndarray:
        # no f64 upcast here: the fast path decimates in f32 and only reads
        # len(wav); the oracle paths convert internally where they need f64
        _tpos, f0 = self._world(np.asarray(wav))
        return f0


class HarvestF0Predictor(DioF0Predictor):
    """WORLD Harvest (HarvestF0Predictor.py:46-69 contract).

    Full port of the published Harvest algorithm (Morise 2017) — dense
    40-channels/octave candidate maps on the decimated signal, harmonic
    instantaneous-frequency refinement with reliability scores, best-score
    contour tracking, and zero-phase smoothing. See f0/world_harvest.py."""

    name = "harvest"

    def _world(self, wav: np.ndarray):
        from .world_harvest import harvest

        fs = float(self.sampling_rate)
        frame_period = 1000.0 * self.hop_length / fs
        return harvest(
            wav, fs,
            f0_floor=max(self.f0_min, 40.0),
            f0_ceil=self.f0_max,
            frame_period=frame_period,
            use_native=not self.exact,
        )
