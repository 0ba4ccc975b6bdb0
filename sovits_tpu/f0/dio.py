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

    Default mode is the fast hybrid: scipy overlap-save band filtering in
    float32 (~1e-6-relative rounding on the filtered signals, negligible
    next to DIO's own estimation error), C++ track extraction + candidate
    scoring, and the C++ direct-bin StoneMask. ``exact=True`` runs the pure
    float64 numpy oracle path (bit-for-bit the parity reference used by
    tests/test_native.py). Measured fast-vs-exact deviation on the
    speechlike fixture (tests/test_f0.py::test_dio_fast_vs_exact_deviation):
    identical voicing decisions, median 0 Hz, worst frame ~6.5 Hz."""

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
        # fast mode decimates the band analysis to ~4 kHz via WORLD's own
        # DioOption::speed knob (dio.cpp decimates identically when
        # speed>1); the exact oracle keeps speed=1 as the reference's
        # pyworld call does
        speed = 1 if self.exact else max(1, min(12, int(fs / 4000.0)))
        tpos, f0 = world_dio_py(
            wav, fs, frame_period=frame_period,
            filter_dtype=np.float64 if self.exact else np.float32,
            native_candidates=fast, speed=speed, **kwargs,
        )
        if fast:
            return tpos, native.world_stonemask(wav, fs, tpos, f0)
        return tpos, world_stonemask_py(wav, fs, tpos, f0)

    def raw_f0(self, wav: np.ndarray, p_len: int) -> np.ndarray:
        _tpos, f0 = self._world(np.asarray(wav, np.float64))
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
