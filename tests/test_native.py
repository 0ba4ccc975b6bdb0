"""Native C++ kernel parity vs the numpy fallback."""

import numpy as np
import pytest

from sovits_tpu import native
from sovits_tpu.f0.dio import DioF0Predictor


def _tone(freq, seconds, sr):
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t) + 0.1 * np.sin(4 * np.pi * freq * t)).astype(np.float64)


def test_native_dio_refine_matches_numpy():
    if not native.dio_refine_available():
        pytest.skip("native toolchain unavailable")
    sr, hop = 44100, 512
    x = _tone(220.0, 0.6, sr)
    n_frames = len(x) // hop
    frame_t = np.arange(n_frames) * hop / sr
    # coarse estimate slightly off so refinement has work to do
    f0 = np.full(n_frames, 223.0)
    f0[:3] = 0.0  # unvoiced frames untouched

    # numpy reference path: call the fallback loop directly
    import sovits_tpu.native as nat

    got_native = nat.dio_refine_f0(x, sr, f0, frame_t)

    # bypass the native dispatch to exercise the numpy body
    orig = nat.dio_refine_available
    nat.dio_refine_available = lambda: False
    try:
        got_numpy = DioF0Predictor._refine(x, sr, f0.copy(), frame_t)
    finally:
        nat.dio_refine_available = orig

    np.testing.assert_array_equal(got_native[:3], 0.0)
    np.testing.assert_allclose(got_native, got_numpy, rtol=1e-6, atol=1e-6)
    # refinement should move toward the true 220 Hz
    mid = slice(5, n_frames - 5)
    assert np.median(np.abs(got_native[mid] - 220.0)) < np.median(np.abs(f0[mid] - 220.0))
