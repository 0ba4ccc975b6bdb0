"""Faithful port of WORLD's DIO + StoneMask F0 estimators (numpy).

The reference delegates to pyworld (WORLD C++: Morise et al.) for its
default `dio` predictor (modules/F0Predictor/DioF0Predictor.py:49-56:
``pyworld.dio`` followed by ``pyworld.stonemask``). This module ports the
*algorithm* of WORLD's dio.cpp / stonemask.cpp step by step — band-pass
filtering with Nuttall-windowed carriers, four event-interval candidate
tracks (negative/positive zero crossings, peaks, dips), deviation-scored
candidate selection, the four contour-fixing passes, and instantaneous-
frequency refinement over the first six harmonics — written independently
from the published algorithm description (no WORLD code is vendored here).

It doubles as the parity reference for the C++ implementation in
native/world_f0.cpp (same operations, same order, fp64).
"""

from __future__ import annotations

import numpy as np
from scipy import fft as sfft

EPS = 0.000000000001  # WORLD's kMySafeGuardMinimum
MAX_SCORE = 100000.0


def decimate(x: np.ndarray, ratio: int) -> np.ndarray:
    """MATLAB-style decimate as WORLD's matlabfunctions uses it: 8th-order
    Chebyshev-I (0.05 dB ripple) at 0.8*nyquist/ratio, zero-phase
    (filtfilt), every ratio-th sample."""
    if ratio == 1:
        return x.copy()
    from scipy import signal as sps

    b, a = sps.cheby1(8, 0.05, 0.8 / ratio)
    return sps.filtfilt(b, a, x)[::ratio]


def _suitable_fft_size(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(n, 1))))


def nuttall_window(n: int) -> np.ndarray:
    """Nuttall window as WORLD defines it (continuous first derivative)."""
    t = np.arange(n, dtype=np.float64) * (1.0 / max(n - 1, 1))
    return (
        0.355768
        - 0.487396 * np.cos(2 * np.pi * t)
        + 0.144232 * np.cos(4 * np.pi * t)
        - 0.012604 * np.cos(6 * np.pi * t)
    )


def _highpass_fir(fs: float) -> tuple[np.ndarray, int]:
    """WORLD's 50 Hz low-cut: inverted normalized Hanning lowpass + delta.
    Returns (fir, cutoff_in_sample); zero-phase = center tap at `cutoff`."""
    cutoff_in_sample = int(round(fs / 50.0))
    n = cutoff_in_sample * 2 + 1
    k = np.arange(1, n + 1, dtype=np.float64)
    lowpass = 0.5 - 0.5 * np.cos(2 * np.pi * k / (n + 1))
    lowpass /= lowpass.sum()
    highpass = -lowpass
    highpass[cutoff_in_sample] += 1.0
    return highpass, cutoff_in_sample


def _band_filtered_signals(
    y: np.ndarray, boundaries: np.ndarray, fs: float,
    filter_dtype=np.float64,
) -> list[np.ndarray]:
    """Low-cut + band-pass the DC-removed signal around each boundary_f0
    (Nuttall window times cosine carrier), delay-compensated.

    Evaluated by overlap-save: the 50 Hz highpass is folded into each band
    FIR in the frequency domain (exact — combined support fits one block),
    the signal's block FFTs are computed ONCE and shared by every band, and
    all inverse FFTs run cache-sized (the big-FFT formulation spends ~4x
    longer in pow2(len(y)) transforms). Identical to direct linear
    convolution up to fp rounding. `filter_dtype=float32` halves FFT cost
    for ~1e-6-relative rounding in the filtered signals (the predictor's
    fast mode); float64 is the parity-oracle default.
    """
    y = y - y.mean()
    y_length = len(y)
    hp, cutoff = _highpass_fir(fs)

    halves = [int(round(fs / b / 2.0)) for b in boundaries]
    l_max = len(hp) + 4 * max(halves) - 1  # longest combined FIR
    n_blk = _suitable_fft_size(4 * l_max)
    step = n_blk - l_max + 1

    # combined FIR spectra: rfft(hp)*rfft(band) == rfft(hp conv band) exactly
    firs = np.zeros((len(boundaries), n_blk), filter_dtype)
    for b, boundary_f0 in enumerate(boundaries):
        n = halves[b] * 4
        w = nuttall_window(n)
        carrier = np.cos(2 * np.pi * boundary_f0 * np.arange(n) / fs)
        firs[b, :n] = (w * carrier).astype(filter_dtype)
    g_spec = sfft.rfft(firs, axis=1, workers=-1)
    g_spec *= sfft.rfft(hp.astype(filter_dtype), n_blk, workers=-1)[None, :]

    # block the (front-padded) signal: block j yields linconv[j*step:(j+1)*step]
    total_out = y_length + cutoff + 2 * max(halves)
    n_blocks = -(-total_out // step)
    z = np.zeros((l_max - 1) + (n_blocks - 1) * step + n_blk, filter_dtype)
    z[l_max - 1 : l_max - 1 + y_length] = y
    idx = np.arange(n_blk)[None, :] + (np.arange(n_blocks) * step)[:, None]
    block_spec = sfft.rfft(z[idx], axis=1, workers=-1)

    out = []
    for b, h in enumerate(halves):
        filt = sfft.irfft(block_spec * g_spec[b], n_blk, axis=1, workers=-1)
        lin = filt[:, l_max - 1 :].reshape(-1)  # linconv[0 : n_blocks*step]
        # compensate the highpass delay (cutoff) + band FIR delay (2*half)
        out.append(np.ascontiguousarray(
            lin[cutoff + 2 * h : cutoff + 2 * h + y_length]))
    return out


def _crossing_events(s: np.ndarray, idx: np.ndarray, fs: float):
    """Refine crossing sample indices -> (interval midpoints [s], f0 [Hz])."""
    if len(idx) < 2:
        return np.empty(0), np.empty(0)
    fine = idx + s[idx] / (s[idx] - s[idx + 1] + EPS)
    intervals = np.diff(fine)
    locations = 0.5 * (fine[:-1] + fine[1:]) / fs
    return locations, fs / np.maximum(intervals, EPS)


def _zero_crossing_track(s: np.ndarray, fs: float) -> tuple[np.ndarray, np.ndarray]:
    """Negative-going zero crossings of s -> (interval midpoints [s],
    instantaneous f0 per interval [Hz])."""
    return _crossing_events(s, np.where((s[:-1] > 0.0) & (s[1:] <= 0.0))[0], fs)


def _four_tracks(filtered: np.ndarray, fs: float):
    """(negative-going, positive-going, peak, dip) event tracks.

    The sign masks are shared between the +/- variants of each signal (one
    `> 0` pass each for s and its first difference instead of eight
    comparison passes over the full-rate signal)."""
    d = np.diff(filtered)
    pos, neg = filtered > 0.0, filtered < 0.0  # (-s > 0) == (s < 0): keep
    dpos, dneg = d > 0.0, d < 0.0              # exact ==0.0 semantics
    neg_going = np.where(pos[:-1] & ~pos[1:])[0]
    pos_going = np.where(neg[:-1] & ~neg[1:])[0]
    peaks = np.where(dpos[:-1] & ~dpos[1:])[0]
    dips = np.where(dneg[:-1] & ~dneg[1:])[0]
    return [
        _crossing_events(filtered, neg_going, fs),
        _crossing_events(-filtered, pos_going, fs),
        _crossing_events(d, peaks, fs),
        _crossing_events(-d, dips, fs),
    ]


def _interp1(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Linear interpolation with linear extrapolation at the edges
    (WORLD's interp1 over event locations)."""
    return np.interp(xq, x, y)


def _candidate_and_score_for_band(
    tracks, boundary_f0: float, f0_floor: float, f0_ceil: float,
    temporal_positions: np.ndarray,
):
    n = len(temporal_positions)
    usable = all(len(loc) > 2 for loc, _ in tracks)
    if not usable:
        return np.zeros(n), np.full(n, MAX_SCORE)
    interpolated = np.stack([
        _interp1(loc, f0v, temporal_positions) for loc, f0v in tracks
    ])  # [4, n]
    candidate = interpolated.mean(axis=0)
    score = np.sqrt(np.sum((interpolated - candidate) ** 2, axis=0) / 3.0)
    bad = (
        (candidate > boundary_f0)
        | (candidate < boundary_f0 / 2.0)
        | (candidate > f0_ceil)
        | (candidate < f0_floor)
    )
    candidate = np.where(bad, 0.0, candidate)
    score = np.where(bad, MAX_SCORE, score)
    return candidate, score


def _fix_step1(best: np.ndarray, voice_range_minimum: int, allowed_range: float):
    f0_base = best.copy()
    f0_base[:voice_range_minimum] = 0.0
    f0_base[len(f0_base) - voice_range_minimum :] = 0.0
    out = np.zeros_like(f0_base)
    for i in range(voice_range_minimum, len(f0_base)):
        if abs((f0_base[i] - f0_base[i - 1]) / (EPS + f0_base[i])) < allowed_range:
            out[i] = f0_base[i]
    return out


def _fix_step2(f0_step1: np.ndarray, voice_range_minimum: int):
    out = f0_step1.copy()
    half = voice_range_minimum // 2
    for i in range(half, len(f0_step1) - half):
        for j in range(-half, half + 1):
            if f0_step1[i + j] == 0.0:
                out[i] = 0.0
                break
    return out


def _select_best_f0(reference: float, candidates: np.ndarray) -> tuple[float, float]:
    errors = np.abs(reference - candidates)
    j = int(np.argmin(errors))
    return float(candidates[j]), float(errors[j])


def _fix_step3(f0_step2: np.ndarray, candidates: np.ndarray, allowed_range: float):
    """Extend each voiced section forward using per-band candidates."""
    out = f0_step2.copy()
    n = len(out)
    for i in range(n - 1):
        if out[i] != 0.0 and out[i + 1] == 0.0:
            for j in range(i + 1, n):
                cand, err = _select_best_f0(out[j - 1], candidates[:, j])
                if err / (out[j - 1] + EPS) < allowed_range and cand != 0.0:
                    out[j] = cand
                else:
                    break
    return out


def _fix_step4(f0_step3: np.ndarray, candidates: np.ndarray, allowed_range: float):
    """Backward extension (mirror of step 3)."""
    out = f0_step3.copy()
    n = len(out)
    for i in range(n - 1, 0, -1):
        if out[i] != 0.0 and out[i - 1] == 0.0:
            for j in range(i - 1, -1, -1):
                cand, err = _select_best_f0(out[j + 1], candidates[:, j])
                if err / (out[j + 1] + EPS) < allowed_range and cand != 0.0:
                    out[j] = cand
                else:
                    break
    return out


def dio(
    x: np.ndarray,
    fs: float,
    f0_floor: float = 71.0,
    f0_ceil: float = 800.0,
    channels_in_octave: float = 2.0,
    frame_period: float = 5.0,  # ms
    allowed_range: float = 0.1,
    filter_dtype=np.float64,
    native_candidates: bool = False,
    speed: int = 1,
    pre_decimated: tuple[np.ndarray, float] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """WORLD DIO. Returns (temporal_positions [s], f0 [Hz], 0 = unvoiced).

    ``filter_dtype=float32`` halves the band-filtering FFT cost for
    ~1e-6-relative rounding in the filtered signals (see
    `_band_filtered_signals`); float64 is the parity-oracle default.
    ``native_candidates=True`` runs the loop-heavy track-extraction +
    candidate scoring in C++ (native/world_f0.cpp, same operations) when
    the library is available; the pure-numpy path is the oracle.
    ``speed`` is WORLD's DioOption::speed decimation ratio (1..12): the
    band analysis runs on the MATLAB-decimated signal at fs/speed, exactly
    as dio.cpp's DioGeneralBody; the reference's pyworld call leaves it at
    the default 1 (no decimation). ``pre_decimated=(y, fs_dec)`` supplies
    an already-decimated band-analysis signal (the predictor's fast path
    shares one decimation FFT between DIO and StoneMask), bypassing the
    internal `decimate` call."""
    # x is only measured (len) when pre_decimated is supplied; the f64
    # upcast (a 3.5 MB copy per 10 s clip) happens lazily below
    x = np.asarray(x)
    n_bands = 1 + int(np.log2(f0_ceil / f0_floor) * channels_in_octave)
    boundaries = f0_floor * 2.0 ** (np.arange(1, n_bands + 1) / channels_in_octave)

    # frame grid from the ORIGINAL signal length/rate (decimation must not
    # change the contract)
    n_frames = int(len(x) / fs * 1000.0 / frame_period) + 1
    temporal_positions = np.arange(n_frames) * frame_period / 1000.0

    if pre_decimated is not None:
        y, fs = pre_decimated
        y = np.asarray(y, np.float64)
    else:
        ratio = int(np.clip(speed, 1, 12))
        y = decimate(np.asarray(x, np.float64), ratio)
        fs = fs / ratio
    y_length = len(y)

    candidates = np.zeros((n_bands, n_frames))
    scores = np.full((n_bands, n_frames), MAX_SCORE)
    filtered_bands = _band_filtered_signals(
        y, boundaries, fs, filter_dtype=filter_dtype
    )
    native_mod = None
    if native_candidates:
        from .. import native as native_mod_  # lazy: optional toolchain

        if native_mod_.world_available():
            native_mod = native_mod_
    for b, boundary in enumerate(boundaries):
        if native_mod is not None:
            candidates[b], scores[b] = native_mod.world_band_candidates(
                filtered_bands[b], fs, boundary, f0_floor, f0_ceil,
                temporal_positions,
            )
        else:
            tracks = _four_tracks(filtered_bands[b], fs)
            candidates[b], scores[b] = _candidate_and_score_for_band(
                tracks, boundary, f0_floor, f0_ceil, temporal_positions
            )

    # best candidate per frame: smallest relative deviation
    rel = scores / (candidates + EPS)
    best_band = np.argmin(rel, axis=0)
    best = candidates[best_band, np.arange(n_frames)]
    best = np.where(scores[best_band, np.arange(n_frames)] >= MAX_SCORE, 0.0, best)

    if native_mod is not None:
        f0 = native_mod.world_fix_steps(
            best, candidates, frame_period, f0_floor, allowed_range
        )
        return temporal_positions, f0
    voice_range_minimum = int(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1
    if len(best) > 2 * voice_range_minimum:
        f0 = _fix_step1(best, voice_range_minimum, allowed_range)
        f0 = _fix_step2(f0, voice_range_minimum)
        f0 = _fix_step3(f0, candidates, allowed_range)
        f0 = _fix_step4(f0, candidates, allowed_range)
    else:
        f0 = best
    return temporal_positions, f0


def _get_mean_f0(
    x: np.ndarray, fs: float, current_position: float, current_f0: float,
    fft_size: int, window_length_in_time: float, base_time: np.ndarray,
) -> float:
    """Instantaneous-frequency weighted mean over harmonics (stonemask)."""
    x_length = len(x)
    idx_raw = np.round((current_position + base_time) * fs + 0.001).astype(np.int64)
    index = np.clip(idx_raw, 0, x_length - 1)
    segment = x[index]

    position = (base_time + window_length_in_time / 2.0) / window_length_in_time
    main_window = (
        0.42
        - 0.5 * np.cos(2 * np.pi * position)
        + 0.08 * np.cos(4 * np.pi * position)
    )
    diff_window = np.zeros_like(main_window)
    diff_window[1:-1] = -(main_window[2:] - main_window[:-2]) / 2.0
    diff_window[0] = -main_window[1] / 2.0
    diff_window[-1] = main_window[-2] / 2.0

    main_spec = np.fft.rfft(segment * main_window, fft_size)
    diff_spec = np.fft.rfft(segment * diff_window, fft_size)
    power = main_spec.real**2 + main_spec.imag**2 + EPS
    bins = np.arange(len(main_spec), dtype=np.float64)
    inst_freq = bins * fs / fft_size + (
        main_spec.real * diff_spec.imag - main_spec.imag * diff_spec.real
    ) / power * fs / (2.0 * np.pi)

    n_harmonics = min(int(fs / 2.0 / current_f0), 6)
    if n_harmonics < 1:
        return 0.0
    num = 0.0
    den = 0.0
    for k in range(1, n_harmonics + 1):
        j = int(round(current_f0 * k * fft_size / fs))
        amp = np.sqrt(power[j])
        num += inst_freq[j] * amp
        den += amp * k
    return float(num / (den + EPS))


def _get_mean_f0_grouped(
    x: np.ndarray, fs: float, positions: np.ndarray, f0s: np.ndarray,
    scores: np.ndarray | None = None,
) -> np.ndarray:
    """GetMeanF0 for many frames at once.

    Frames are grouped by their fft_size (a handful of values); inside a
    group the per-frame Blackman windows (length 2*h_i+1 varies with f0)
    are built by broadcasting and zero-padded into the common fft_size, so
    each group is TWO batched FFTs. The FFT of a zero-padded windowed
    segment equals the per-frame transform — numerically identical to the
    frame-by-frame algorithm."""
    out = np.zeros_like(f0s)
    halves = (1.5 * fs / f0s + 1.0).astype(np.int64)
    wlens = 2 * halves + 1
    fft_sizes = 1 << (
        2 + np.ceil(np.log2(wlens.astype(np.float64))).astype(np.int64)
    )
    x_len = len(x)
    for fft_size in np.unique(fft_sizes):
        sel = np.where(fft_sizes == fft_size)[0]
        h = halves[sel]  # [n]
        wl = wlens[sel]
        max_wl = int(wl.max())
        m = np.arange(max_wl)  # [max_wl]
        valid = m[None, :] < wl[:, None]  # [n, max_wl]

        # sample index: round((pos + (m - h)/fs)*fs + 0.001)
        #             = round(pos*fs + 0.001) + m - h   (integer offset)
        base_idx = np.round(positions[sel] * fs + 0.001).astype(np.int64)
        idx = base_idx[:, None] + m[None, :] - h[:, None]
        idx = np.clip(idx, 0, x_len - 1)
        segments = np.where(valid, x[idx], 0.0)

        # Blackman over the window: position = (m + 0.5) / wlen
        pos = (m[None, :] + 0.5) / wl[:, None]
        main_window = np.where(
            valid,
            0.42 - 0.5 * np.cos(2 * np.pi * pos) + 0.08 * np.cos(4 * np.pi * pos),
            0.0,
        )
        # centered difference with the per-frame boundary handling
        diff_window = np.zeros_like(main_window)
        diff_window[:, 1:-1] = -(main_window[:, 2:] - main_window[:, :-2]) / 2.0
        diff_window[:, 0] = -main_window[:, 1] / 2.0
        rows = np.arange(len(sel))
        last = wl - 1
        diff_window[rows, last] = main_window[rows, last - 1] / 2.0
        # interior formula wrote values past each frame's window — clear them
        diff_window = np.where(valid, diff_window, 0.0)
        # re-apply the boundary value (np.where above kept it: last < wl)

        main_spec = sfft.rfft(segments * main_window, int(fft_size), axis=1, workers=-1)
        diff_spec = sfft.rfft(segments * diff_window, int(fft_size), axis=1, workers=-1)
        power = main_spec.real**2 + main_spec.imag**2 + EPS
        bins = np.arange(main_spec.shape[1], dtype=np.float64)
        inst_freq = bins[None, :] * fs / fft_size + (
            main_spec.real * diff_spec.imag - main_spec.imag * diff_spec.real
        ) / power * fs / (2.0 * np.pi)

        f = f0s[sel]
        ks = np.arange(1, 7, dtype=np.float64)  # up to 6 harmonics
        n_harm = np.minimum((fs / 2.0 / f).astype(np.int64), 6)
        j = np.round(f[:, None] * ks[None, :] * fft_size / fs).astype(np.int64)
        j = np.clip(j, 0, main_spec.shape[1] - 1)
        amp = np.sqrt(power[rows[:, None], j])
        freq = inst_freq[rows[:, None], j]
        valid_k = ks[None, :] <= n_harm[:, None]
        num = np.sum(np.where(valid_k, freq * amp, 0.0), axis=1)
        den = np.sum(np.where(valid_k, amp * ks[None, :], 0.0), axis=1)
        refined = np.where(n_harm >= 1, num / (den + EPS), 0.0)
        out[sel] = refined
        if scores is not None:
            # reliability = fundamental-strength-weighted inverse of the
            # mean amp-weighted relative IF deviation (see native refine_one:
            # the amp(k=1)/max(amp) factor kills subharmonic explanations)
            dev_k = np.abs(freq / ks[None, :] - refined[:, None]) / (
                refined[:, None] + EPS
            )
            dev = np.sum(np.where(valid_k, amp * dev_k, 0.0), axis=1) / (
                np.sum(np.where(valid_k, amp, 0.0), axis=1) + EPS
            )
            amax = np.max(np.where(valid_k, amp, 0.0), axis=1)
            w1 = amp[:, 0] / (amax + EPS)
            scores[sel] = np.where(n_harm >= 1, w1 / (dev + EPS), 0.0)
    return out


def stonemask(
    x: np.ndarray, fs: float, temporal_positions: np.ndarray, f0: np.ndarray
) -> np.ndarray:
    """WORLD StoneMask refinement of a DIO contour (two grouped passes:
    the second recenters on the first estimate when it stays within 20%,
    exactly the per-frame algorithm's control flow)."""
    x = np.asarray(x, np.float64)
    f0 = np.asarray(f0, np.float64)
    tpos = np.asarray(temporal_positions, np.float64)
    out = np.zeros_like(f0)
    voiced = np.where(f0 > 0.0)[0]
    if len(voiced) == 0:
        return out
    first = _get_mean_f0_grouped(x, fs, tpos[voiced], f0[voiced])
    second = first.copy()
    again = (np.abs(first - f0[voiced]) <= f0[voiced] * 0.2) & (first > 0)
    if again.any():
        second[again] = _get_mean_f0_grouped(
            x, fs, tpos[voiced][again], first[again]
        )
    out[voiced] = np.where(second > 0, second, f0[voiced])
    return out
