"""Native C++ WORLD port: parity vs the numpy reference implementation."""

import numpy as np
import pytest

from sovits_tpu import native
from sovits_tpu.f0 import world_dio as wd


def _speechy(seconds=1.2, sr=44100, base=220.0, vib=12.0, seed=0):
    """Harmonic-rich signal with vibrato and an unvoiced noise tail."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = base + vib * np.sin(2 * np.pi * 3.1 * t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    wav = 0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase) + 0.1 * np.sin(3 * phase)
    cut = int(0.8 * len(t))
    wav[cut:] = 0.01 * rng.standard_normal(len(t) - cut)
    return wav.astype(np.float64), f0, cut


@pytest.mark.skipif(not native.world_available(), reason="native toolchain unavailable")
def test_native_world_dio_matches_numpy():
    wav, _f0_true, _ = _speechy()
    sr, hop = 44100, 512
    fp = 1000.0 * hop / sr
    tp_c, f0_c = native.world_dio(wav, sr, frame_period=fp)
    tp_p, f0_p = wd.dio(wav, sr, frame_period=fp)
    np.testing.assert_allclose(tp_c, tp_p)
    np.testing.assert_allclose(f0_c, f0_p, rtol=1e-7, atol=1e-6)

    r_c = native.world_stonemask(wav, sr, tp_c, f0_c)
    r_p = wd.stonemask(wav, sr, tp_p, f0_p)
    np.testing.assert_allclose(r_c, r_p, rtol=1e-7, atol=1e-6)


@pytest.mark.skipif(not native.world_available(), reason="native toolchain unavailable")
def test_fast_hybrid_matches_exact_oracle():
    """The production fast path (float32 overlap-save filtering + C++
    candidates/fix-steps/stonemask) must agree with the float64 numpy
    oracle: identical voicing decisions and sub-ppm f0 on the fixture."""
    wav, _f0_true, _ = _speechy()
    sr, hop = 44100, 512
    fp = 1000.0 * hop / sr
    tp_e, f0_e = wd.dio(wav, sr, frame_period=fp)
    sm_e = wd.stonemask(wav, sr, tp_e, f0_e)
    tp_f, f0_f = wd.dio(wav, sr, frame_period=fp,
                        filter_dtype=np.float32, native_candidates=True)
    sm_f = native.world_stonemask(wav, sr, tp_f, f0_f)
    np.testing.assert_allclose(tp_f, tp_e)
    assert ((sm_e > 0) == (sm_f > 0)).all()
    v = sm_e > 0
    assert np.abs(sm_e[v] - sm_f[v]).max() / sm_e[v].min() < 1e-5


@pytest.mark.skipif(not native.world_available(), reason="native toolchain unavailable")
def test_native_candidates_exact_on_f64():
    """C++ track extraction + candidate scoring + fix steps reproduce the
    pure-numpy path bit-near-exactly when filtering stays float64."""
    wav, _f0_true, _ = _speechy(seed=3)
    sr, hop = 44100, 512
    fp = 1000.0 * hop / sr
    _, f0_py = wd.dio(wav, sr, frame_period=fp)
    _, f0_cc = wd.dio(wav, sr, frame_period=fp, native_candidates=True)
    np.testing.assert_allclose(f0_cc, f0_py, rtol=1e-9, atol=1e-9)


@pytest.mark.skipif(not native.world_available(), reason="native toolchain unavailable")
def test_native_world_dio_accuracy():
    wav, f0_true, cut = _speechy()
    sr, hop = 44100, 512
    tp, f0 = native.world_dio(wav, sr, frame_period=1000.0 * hop / sr)
    f0 = native.world_stonemask(wav, sr, tp, f0)
    frames_voiced = tp < (cut / sr - 0.05)
    v = f0[frames_voiced]
    truth = np.interp(tp[frames_voiced], np.arange(len(wav)) / sr, f0_true)
    mask = v > 0
    assert mask.mean() > 0.9  # voiced region detected as voiced
    assert np.abs(v[mask] - truth[mask]).mean() < 2.0  # Hz
    tail = tp > (cut / sr + 0.05)
    assert (f0[tail] > 0).mean() < 0.2  # noise stays mostly unvoiced


@pytest.mark.skipif(not native.world_available(), reason="native toolchain unavailable")
def test_native_harvest_remove_unreliable_matches_numpy():
    """C++ harvest stage 7 == the numpy sentinel-sort oracle, bit-exact.

    Random candidate matrices with clustered values so the 5% agreement
    gate exercises both keep and kill paths, plus empty frames (which must
    kill ALL neighbours' candidates, as WORLD does)."""
    from sovits_tpu.f0.world_harvest import UNRELIABLE_THRESHOLD, _remove_unreliable

    rng = np.random.default_rng(7)
    for _ in range(25):
        n_frames = int(rng.integers(2, 200))
        k = int(rng.integers(1, 40))
        cands = np.where(
            rng.random((n_frames, k)) < 0.35,
            rng.uniform(60, 1100, (n_frames, k)), 0.0,
        )
        base = rng.uniform(80, 400)
        cluster = rng.random((n_frames, k)) < 0.3
        cands = np.where(
            cluster, base * rng.uniform(0.97, 1.03, (n_frames, k)), cands
        )
        cands[rng.integers(0, n_frames)] = 0.0  # an empty frame
        scores = np.where(cands > 0, rng.uniform(1, 10, (n_frames, k)), 0.0)

        c_py, s_py = cands.copy(), scores.copy()
        _remove_unreliable(c_py, s_py)
        c_cc = np.ascontiguousarray(cands.copy())
        s_cc = np.ascontiguousarray(scores.copy())
        native.world_harvest_remove_unreliable(c_cc, s_cc, UNRELIABLE_THRESHOLD)
        np.testing.assert_array_equal(c_cc, c_py)
        np.testing.assert_array_equal(s_cc, s_py)
