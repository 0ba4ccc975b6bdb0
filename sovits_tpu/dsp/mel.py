"""Mel filterbank construction (host-side, numpy).

Produces a filterbank numerically identical to ``librosa.filters.mel`` with
its defaults (Slaney mel scale, Slaney area normalization), which is what the
reference pipeline uses to build its mel basis
(/root/reference/modules/mel_processing.py:72).  Computed once in float64 on
the host and baked into jitted programs as a constant.
"""

from __future__ import annotations

import functools

import numpy as np

# Slaney mel-scale constants.
_F_SP = 200.0 / 3.0  # Hz per mel below the log knee
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(frequencies: np.ndarray) -> np.ndarray:
    """Slaney-scale Hz -> mel (librosa default, htk=False)."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    mels = frequencies / _F_SP
    log_region = frequencies >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(frequencies, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    """Slaney-scale mel -> Hz."""
    mels = np.asanyarray(mels, dtype=np.float64)
    freqs = _F_SP * mels
    log_region = mels >= _MIN_LOG_MEL
    freqs = np.where(
        log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mels - _MIN_LOG_MEL)), freqs
    )
    return freqs


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asanyarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asanyarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    dtype=np.float32,
    htk: bool = False,
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_freqs, n_mels] (channels-last).

    Note the transposed layout vs librosa ([n_mels, n_freqs]): in this
    framework spectrograms are [B, T, F], so mel projection is a plain
    ``spec @ fbank`` matmul that lands on the MXU. htk=True switches to the
    HTK mel scale (used by RMVPE's front-end); area norm stays Slaney
    (librosa's default norm).
    """
    if fmax is None:
        fmax = float(sample_rate) / 2.0

    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, float(sample_rate) / 2.0, n_freqs, dtype=np.float64)

    if htk:
        mel_edges = mel_to_hz_htk(
            np.linspace(hz_to_mel_htk(fmin), hz_to_mel_htk(fmax), n_mels + 2)
        )
    else:
        mel_edges = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_edges)
    ramps = mel_edges[:, None] - fftfreqs[None, :]  # [n_mels+2, n_freqs]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # [n_mels, n_freqs]

    # Slaney-style area normalization.
    enorm = 2.0 / (mel_edges[2 : n_mels + 2] - mel_edges[:n_mels])
    weights *= enorm[:, None]

    return np.ascontiguousarray(weights.T).astype(dtype)


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return w.astype(dtype)
