"""DIO-family F0 estimation, reimplemented from the published algorithm.

The reference delegates to pyworld's C++ ``dio``/``harvest`` + ``stonemask``
(modules/F0Predictor/DioF0Predictor.py:49-56). Those wrap the WORLD vocoder
algorithms (Morise et al.): band-wise lowpass filtering, period estimation
from four event-interval tracks (zero crossings up/down, peaks, dips),
reliability-based candidate selection, and instantaneous-frequency
refinement. This module reimplements that algorithm family in vectorized
numpy (host-side preprocessing, like the reference) — it is an independent
implementation, not a binding, so results are close but not bit-identical
to WORLD.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps

from .base import F0Predictor


def _nuttall_lowpass(x: np.ndarray, fs: float, cutoff_hz: float) -> np.ndarray:
    """FIR lowpass with a Nuttall window sized to ~2 periods of the cutoff."""
    half = max(int(round(fs / cutoff_hz)), 4)
    n = 2 * half + 1
    t = np.arange(n) - half
    sinc = np.sinc(2.0 * cutoff_hz / fs * t) * (2.0 * cutoff_hz / fs)
    win = sps.windows.nuttall(n)
    fir = sinc * win
    fir /= fir.sum() + 1e-12
    # zero-phase filtering via frequency-domain convolution
    return sps.fftconvolve(x, fir, mode="same")


def _event_intervals(times: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Event times -> (midpoint times, instantaneous f0 per interval)."""
    if len(times) < 2:
        return np.empty(0), np.empty(0)
    intervals = np.diff(times)
    good = intervals > 1e-6
    mids = 0.5 * (times[:-1] + times[1:])[good]
    return mids, 1.0 / intervals[good]


def _zero_crossings(x: np.ndarray, fs: float, rising: bool) -> np.ndarray:
    s = x if rising else -x
    idx = np.where((s[:-1] < 0) & (s[1:] >= 0))[0]
    if len(idx) == 0:
        return np.empty(0)
    frac = -s[idx] / (s[idx + 1] - s[idx] + 1e-20)
    return (idx + frac) / fs


def _extrema_times(x: np.ndarray, fs: float, peaks: bool) -> np.ndarray:
    d = np.diff(x)
    return _zero_crossings(d, fs, rising=not peaks)


class DioF0Predictor(F0Predictor):
    """DIO-style estimator: band candidates + reliability pick + refinement."""

    name = "dio"
    channels_in_octave = 2.0

    def raw_f0(self, wav: np.ndarray, p_len: int) -> np.ndarray:
        fs = float(self.sampling_rate)
        x = np.asarray(wav, dtype=np.float64)
        x = x - x.mean()
        frame_t = np.arange(p_len) * self.hop_length / fs

        n_bands = int(
            np.ceil(np.log2(self.f0_max / self.f0_min) * self.channels_in_octave)
        )
        boundaries = self.f0_min * 2.0 ** (
            (np.arange(n_bands) + 1.0) / self.channels_in_octave
        )

        cand = np.zeros((n_bands, p_len))
        score = np.full((n_bands, p_len), np.inf)

        for b, bf in enumerate(boundaries):
            y = _nuttall_lowpass(x, fs, bf)
            if np.max(np.abs(y)) < 1e-8:
                continue
            tracks = []
            for times in (
                _zero_crossings(y, fs, rising=True),
                _zero_crossings(y, fs, rising=False),
                _extrema_times(y, fs, peaks=True),
                _extrema_times(y, fs, peaks=False),
            ):
                mids, f0s = _event_intervals(times)
                if len(mids) < 2:
                    tracks = []
                    break
                tracks.append(np.interp(frame_t, mids, f0s, left=0.0, right=0.0))
            if not tracks:
                continue
            tracks = np.stack(tracks)  # [4, p_len]
            mean = tracks.mean(axis=0)
            std = tracks.std(axis=0)
            valid = (
                (mean > max(self.f0_min, bf / 4.0))
                & (mean < min(self.f0_max, bf * 1.1))
                & (mean > 0)
            )
            rel = np.where(valid & (mean > 0), std / (mean + 1e-12), np.inf)
            better = rel < score[b]
            cand[b] = np.where(better, mean, cand[b])
            score[b] = np.where(better, rel, score[b])

        best = np.argmin(score, axis=0)
        f0 = cand[best, np.arange(p_len)]
        best_score = score[best, np.arange(p_len)]
        f0 = np.where(best_score < 0.12, f0, 0.0)  # reliability gate

        f0 = self._fix_contour(f0)
        return self._refine(x, fs, f0, frame_t)

    @staticmethod
    def _fix_contour(f0: np.ndarray, allowed_range: float = 0.1) -> np.ndarray:
        """Drop implausible jumps and very short voiced islands."""
        out = f0.copy()
        prev = 0.0
        for i in range(1, len(out)):
            if out[i] > 0 and prev > 0:
                if abs(out[i] - prev) / prev > allowed_range * 2:
                    out[i] = 0.0
            prev = out[i] if out[i] > 0 else prev * 0.0
        # remove voiced runs shorter than 3 frames
        voiced = out > 0
        edges = np.flatnonzero(np.diff(np.concatenate([[0], voiced.view(np.int8), [0]])))
        for s, e in zip(edges[::2], edges[1::2]):
            if e - s < 3:
                out[s:e] = 0.0
        return out

    @staticmethod
    def _refine(x: np.ndarray, fs: float, f0: np.ndarray, frame_t: np.ndarray) -> np.ndarray:
        """Instantaneous-period refinement (StoneMask-style, via local NAC).

        For each voiced frame, refine the period as the parabolic-interpolated
        peak of the normalized autocorrelation around the current period
        estimate, over a window of ~3 periods. Uses the native C++ kernel
        (sovits_tpu/native) when built; this numpy loop is the fallback and
        the parity reference.
        """
        from .. import native

        if native.dio_refine_available():
            return native.dio_refine_f0(x, fs, f0, frame_t)
        out = f0.copy()
        n = len(x)
        for i, (t, f) in enumerate(zip(frame_t, f0)):
            if f <= 0:
                continue
            period = fs / f
            half = int(1.5 * period)
            c = int(t * fs)
            lo, hi = max(c - half, 0), min(c + half + 1, n)
            seg = x[lo:hi]
            if len(seg) < int(1.2 * period) + 3:
                continue
            seg = seg - seg.mean()
            lag0 = int(round(period))
            window = 4
            lags = np.arange(max(lag0 - window, 1), min(lag0 + window + 1, len(seg) - 1))
            if len(lags) < 3:
                continue
            ac = np.array(
                [
                    np.dot(seg[:-lag], seg[lag:])
                    / (np.linalg.norm(seg[:-lag]) * np.linalg.norm(seg[lag:]) + 1e-12)
                    for lag in lags
                ]
            )
            k = int(np.argmax(ac))
            # parabolic interpolation of the peak
            if 0 < k < len(lags) - 1:
                denom = ac[k - 1] - 2 * ac[k] + ac[k + 1]
                delta = 0.5 * (ac[k - 1] - ac[k + 1]) / (denom + 1e-12)
                delta = np.clip(delta, -1.0, 1.0)
            else:
                delta = 0.0
            refined_period = lags[k] + delta
            if refined_period > 1:
                out[i] = fs / refined_period
        return out


class HarvestF0Predictor(DioF0Predictor):
    """Harvest-style variant: denser candidate bands + stronger smoothing.

    The reference wraps pyworld.harvest (HarvestF0Predictor.py:46-69); this
    reuses the DIO machinery with many more channels per octave (Harvest's
    key difference is a dense candidate set with refined scoring).
    """

    name = "harvest"
    channels_in_octave = 12.0

    def raw_f0(self, wav, p_len):
        f0 = super().raw_f0(wav, p_len)
        # light median smoothing over voiced runs (harvest produces smoother
        # contours than dio)
        voiced = f0 > 0
        if voiced.any():
            sm = sps.medfilt(np.where(voiced, f0, np.nan), kernel_size=3)
            f0 = np.where(voiced & ~np.isnan(sm), sm, f0)
        return f0
