"""Inference orchestration tests: slicer, Svc facade end-to-end, RealTimeVC."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.tiny import make_synthetic_dataset, tiny_hps

from sovits_tpu import config as scfg
from sovits_tpu.infer import slicer as slicer_mod
from sovits_tpu.infer.svc import Svc, crossfade, pad_array
from sovits_tpu.models import factory
from sovits_tpu.train import checkpoint as ckpt_lib
from sovits_tpu.train.step import create_train_state, make_optimizer

SR = 8000


def _tone(freq, seconds, sr=SR, amp=0.3):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_slicer_finds_silence():
    sil = np.zeros(SR, dtype=np.float32)
    audio = np.concatenate([_tone(220, 6.0), sil, _tone(330, 6.0)])
    # max_sil_kept shorter than the 1 s gap => the gap is emitted as a
    # removable silence chunk (otherwise it's just a cut point, matching
    # slicer.py:61-67 semantics).
    chunks = slicer_mod.Slicer(sr=SR, threshold=-40, max_sil_kept=300).slice(audio)
    segs = slicer_mod.chunks2audio(audio, chunks)
    assert len(segs) >= 3
    assert any(is_sil for is_sil, _ in segs)
    assert sum(len(s) for _, s in segs) == len(audio)

    # default params: the gap stays within max_sil_kept -> single cut point
    chunks2 = slicer_mod.cut(audio, SR, db_thresh=-40)
    segs2 = slicer_mod.chunks2audio(audio, chunks2)
    assert sum(len(s) for _, s in segs2) == len(audio)
    assert len(segs2) >= 2


def test_slicer_short_audio_single_chunk():
    audio = _tone(220, 0.3)
    chunks = slicer_mod.cut(audio, SR)
    assert len(chunks) == 1 and chunks["0"]["slice"] is False


def test_pad_array_and_crossfade():
    a = np.ones(100)
    assert len(pad_array(a, 150)) == 150
    assert len(pad_array(a, 60)) == 60
    b = np.zeros(100)
    out = crossfade(a, b, 20)
    assert len(out) == 180
    assert out[0] == 1 and out[-1] == 0


from tests.conftest import FakeEncoder  # shared with serving tests


def test_svc_infer_single_clip(svc):
    wav = _tone(220, 0.6)
    audio, n_samples, n_frames = svc.infer(
        "spk0", 0, wav, sr=SR, f0_predictor="yin", noice_scale=0.0
    )
    assert n_frames == len(wav) // svc.hop_size
    assert n_samples == n_frames * svc.hop_size
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0  # tanh output


def test_svc_infer_transpose_and_speaker_id(svc):
    wav = _tone(220, 0.5)
    audio, _, _ = svc.infer(1, 12, wav, sr=SR, f0_predictor="yin")
    assert np.isfinite(audio).all()


def test_svc_unknown_speaker_raises(svc):
    with pytest.raises(RuntimeError):
        svc.infer("nobody", 0, _tone(220, 0.5), sr=SR, f0_predictor="yin")


def test_svc_slice_inference(svc):
    audio_in = np.concatenate(
        [_tone(220, 5.2), np.zeros(SR, dtype=np.float32), _tone(280, 5.2)]
    )
    out = svc.slice_inference(
        audio_in, SR, "spk0", 0, slice_db=-40, f0_predictor="yin", noice_scale=0.0
    )
    assert np.isfinite(out).all()
    # output length ~ input length (hop-quantized per chunk)
    assert abs(len(out) - len(audio_in)) < 0.05 * len(audio_in)


def test_svc_spk_mix_frames(svc):
    wav = _tone(220, 0.4)
    n_frames = len(wav) // svc.hop_size
    mix = np.zeros((n_frames, svc.hps.model.n_speakers), np.float32)
    mix[: n_frames // 2, 0] = 1.0
    mix[n_frames // 2 :, 1] = 1.0
    audio, _, _ = svc.infer(
        None, 0, wav, sr=SR, f0_predictor="yin", spk_mix_frames=mix
    )
    assert np.isfinite(audio).all()


def test_crossfade_seam_is_linear_blend():
    from sovits_tpu.infer.svc import crossfade

    a = np.ones(100, np.float32)
    b = np.zeros(100, np.float32) + 3.0
    out = crossfade(a, b, 20)
    assert out.shape == (180,)
    np.testing.assert_allclose(out[:80], 1.0)
    np.testing.assert_allclose(out[100:], 3.0)
    seam = out[80:100]
    # linear ramp from 1 -> 3, monotone, no discontinuity at either end
    assert np.all(np.diff(seam) >= 0)
    np.testing.assert_allclose(seam[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(seam[-1], 3.0, atol=1e-6)


def test_realtime_vc_streaming(svc):
    """Chunked tone -> continuous output stream (infer_tool.py:498-546):
    every chunk returns chunk_len samples and the crossfaded seams stay
    bounded relative to the signal's own dynamics."""
    from sovits_tpu.infer.svc import RealTimeVC

    sr = svc.target_sample
    chunk_len, pre_len = 2048, 512
    rtvc = RealTimeVC(chunk_len=chunk_len, pre_len=pre_len)

    t = np.arange(sr * 2) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    outs = []
    for i in range(3):
        chunk = wav[i * chunk_len : (i + 1) * chunk_len]
        out = rtvc.process(svc, "spk0", 0, chunk, sr=sr, f0_predictor="yin")
        assert out.shape == (chunk_len,)
        assert np.isfinite(out).all()
        outs.append(out)
    stream = np.concatenate(outs)
    # crossfade keeps the stream's seam steps within the clip's own
    # sample-to-sample dynamics (no hard discontinuity at chunk joins)
    step = np.abs(np.diff(stream))
    seam_steps = step[[chunk_len - 1, 2 * chunk_len - 1]]
    assert (seam_steps <= max(step.max() * 0.9, 1e-3) + 1e-6).all()
    # streaming state advanced: later chunks use left context
    assert rtvc.last_chunk is not None and rtvc.last_chunk.shape == (pre_len,)


def test_batched_dispatch_matches_single(svc):
    """_run_synth_batch groups same-bucket chunks into one device call;
    with noice_scale=0 it must be bit-identical to per-chunk dispatch."""
    sr = svc.target_sample
    t = np.arange(sr // 2) / sr
    wavs = [
        (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32) for f in (200.0, 250.0, 300.0)
    ]
    items = [
        svc._prepare_chunk("spk0", 0, w, sr, 0.0, False, "yin", 0.05)
        for w in wavs
    ]
    batched = svc._run_synth_batch(items, 0.0, False, 52468, sample_noise=False)
    singles = [
        svc._run_synth_batch([it], 0.0, False, 52468, sample_noise=False)[0]
        for it in items
    ]
    for b, s in zip(batched, singles):
        np.testing.assert_allclose(b, s, rtol=1e-5, atol=1e-6)
