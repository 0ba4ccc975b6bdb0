"""Golden tests for the DSP bedrock against torch reference semantics.

The torch expressions below restate the numerical contract of
/root/reference/modules/mel_processing.py and utils.py (cited per test);
they are the spec, independently re-expressed — bit-comparability to the
reference front-end is the Phase-0 exit criterion (SURVEY.md section 7).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from sovits_tpu import dsp


def _torch_spectrogram(y, n_fft, hop, win):
    """spectrogram_torch contract (mel_processing.py:40-64), center=False."""
    window = torch.hann_window(win)
    pad = int((n_fft - hop) / 2)
    y = tF.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=window,
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6)  # [B, F, T]


@pytest.mark.parametrize("length", [44100, 44100 + 511, 10240])
def test_spectrogram_matches_torch(length):
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, length)).astype(np.float32) * 0.3

    ref = _torch_spectrogram(torch.from_numpy(y), 2048, 512, 2048).numpy()
    got = np.asarray(dsp.spectrogram(jnp.asarray(y), 2048, 512, 2048))

    assert got.shape == (2, ref.shape[2], ref.shape[1])  # [B, T, F] layout
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-4)


def test_spectrogram_frame_count_alignment():
    # For L = k * hop the frame count equals k (dataset alignment invariant,
    # data_utils.py:86-87).
    y = jnp.zeros((1, 512 * 100))
    spec = dsp.spectrogram(y, 2048, 512, 2048)
    assert spec.shape[1] == 100


def test_mel_filterbank_matches_slaney_hand_derivation():
    """Anchor the Slaney filterbank against a hand-derived small case.

    sr=16000, n_fft=16, n_mels=4, fmax=8000: mel edges are
    hz_to_mel(8000) = 15 + log(8)/(log(6.4)/27) = 45.2775 mels,
    linspace -> edge Hz = [0, 603.68, 1238.17, 2306.18, 4295.35, 8000].
    Filter 0 at the 1000 Hz FFT bin sits on the falling ramp:
    (1238.17-1000)/(1238.17-603.68) * 2/(1238.17-0) = 6.0515e-4.
    """
    fb = dsp.mel_filterbank(16000, 16, 4).T  # [n_mels, n_freqs]
    assert abs(dsp.hz_to_mel(8000.0) - 45.24564) < 1e-4
    edges = dsp.mel_to_hz(np.linspace(0.0, dsp.hz_to_mel(8000.0), 6))
    np.testing.assert_allclose(
        edges, [0.0, 603.2752, 1237.3978, 2305.1696, 4294.3401, 8000.0], rtol=1e-5
    )
    # falling ramp of filter 0 at the 1000 Hz bin, times slaney area norm:
    expected = (1237.3978 - 1000.0) / (1237.3978 - 603.2752) * 2.0 / 1237.3978
    np.testing.assert_allclose(fb[0, 1], expected, rtol=1e-4)
    assert (fb >= 0).all()
    # Every filter has support; peaks decrease with slaney area norm.
    assert (fb.sum(axis=1) > 0).all()


def test_mel_spectrogram_pipeline():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((1, 44100)).astype(np.float32) * 0.1
    mel = dsp.mel_spectrogram(jnp.asarray(y))
    assert mel.shape == (1, 44100 // 512, 80)
    # log-compression floor: log(1e-5)
    assert float(mel.min()) >= np.log(1e-5) - 1e-5
    assert np.isfinite(np.asarray(mel)).all()


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        dsp.hann_window(2048), torch.hann_window(2048).numpy(), atol=1e-6
    )


def test_f0_to_coarse_matches_torch():
    # utils.py:69-80 restated in torch.
    f0_bin, f0_max, f0_min = 256, 1100.0, 50.0
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)

    def torch_f0_to_coarse(f0):
        f0_mel = 1127 * (1 + f0 / 700).log()
        a = (f0_bin - 2) / (f0_mel_max - f0_mel_min)
        b = f0_mel_min * a - 1.0
        f0_mel = torch.where(f0_mel > 0, f0_mel * a - b, f0_mel)
        f0_coarse = torch.round(f0_mel).long()
        f0_coarse = f0_coarse * (f0_coarse > 0)
        f0_coarse = f0_coarse + ((f0_coarse < 1) * 1)
        f0_coarse = f0_coarse * (f0_coarse < f0_bin)
        f0_coarse = f0_coarse + ((f0_coarse >= f0_bin) * (f0_bin - 1))
        return f0_coarse

    f0 = np.concatenate(
        [np.zeros(10), np.linspace(30, 1300, 200), [50.0, 1100.0]]
    ).astype(np.float32)
    ref = torch_f0_to_coarse(torch.from_numpy(f0)).numpy()
    got = np.asarray(dsp.f0_to_coarse(jnp.asarray(f0)))
    np.testing.assert_array_equal(got, ref)
    # Within the reference's valid range (f0 <= F0_MAX) bins stay in [1, 255];
    # above F0_MAX the reference maps to 0 (utils.py:78 zeroes out-of-range).
    valid = f0 <= 1100.0
    assert got[valid].min() >= 1 and got[valid].max() <= 255


def test_normalize_f0_matches_torch():
    # utils.py:31-45 with random_scale=False.
    rng = np.random.default_rng(2)
    f0 = np.abs(rng.standard_normal((2, 50))).astype(np.float32)
    uv = (rng.uniform(size=(2, 50)) > 0.3).astype(np.float32)
    mask = np.ones((2, 50, 1), dtype=np.float32)

    t_f0 = torch.from_numpy(f0).unsqueeze(1)  # [B, 1, T]
    t_uv = torch.from_numpy(uv)
    uv_sum = torch.sum(t_uv, dim=1, keepdim=True)
    uv_sum[uv_sum == 0] = 9999
    means = torch.sum(t_f0[:, 0, :] * t_uv, dim=1, keepdim=True) / uv_sum
    ref = ((t_f0 - means.unsqueeze(-1)) * 1.0).squeeze(1).numpy()

    got = np.asarray(
        dsp.normalize_f0(jnp.asarray(f0)[..., None], jnp.asarray(mask), jnp.asarray(uv))
    )[..., 0]
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_volume_extractor_matches_torch():
    # utils.py:560-572 restated in torch.
    rng = np.random.default_rng(3)
    y = rng.standard_normal((1, 512 * 40 + 13)).astype(np.float32) * 0.5
    hop = 512

    audio = torch.from_numpy(y)
    n_frames = int(audio.size(-1) // hop)
    audio2 = audio**2
    audio2 = tF.pad(audio2, (hop // 2, (hop + 1) // 2), mode="reflect")
    volume = (
        tF.unfold(audio2[:, None, None, :], (1, hop), stride=hop)[:, :, :n_frames]
        .mean(dim=1)[0]
        .sqrt()
        .numpy()
    )

    got = np.asarray(dsp.energy(jnp.asarray(y), hop))[0]
    np.testing.assert_allclose(got, volume, rtol=1e-5, atol=1e-6)


def test_repeat_expand_nearest_matches_torch():
    rng = np.random.default_rng(4)
    content = rng.standard_normal((30, 8)).astype(np.float32)  # [T, C]
    target_len = 52
    ref = (
        tF.interpolate(
            torch.from_numpy(content.T)[None], size=target_len, mode="nearest"
        )[0]
        .numpy()
        .T
    )
    got = np.asarray(dsp.repeat_expand(jnp.asarray(content), target_len, "nearest"))
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_repeat_expand_linear_matches_torch():
    rng = np.random.default_rng(5)
    content = rng.standard_normal((30, 8)).astype(np.float32)
    target_len = 52
    ref = (
        tF.interpolate(
            torch.from_numpy(content.T)[None], size=target_len, mode="linear"
        )[0]
        .numpy()
        .T
    )
    got = np.asarray(dsp.repeat_expand(jnp.asarray(content), target_len, "linear"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_slice_segments_matches_reference_semantics():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 40, 4)).astype(np.float32)
    ids = np.array([0, 5, 19], dtype=np.int32)
    got = np.asarray(dsp.slice_segments(jnp.asarray(x), jnp.asarray(ids), 21))
    for i, s in enumerate(ids):
        np.testing.assert_array_equal(got[i], x[i, s : s + 21])


def test_rand_slice_within_bounds():
    x = jnp.zeros((4, 100, 8))
    pitch = jnp.zeros((4, 100))
    lengths = jnp.array([100, 50, 30, 21])
    seg = 20
    _, _, ids = dsp.rand_slice_segments_with_pitch(
        jax.random.PRNGKey(0), x, pitch, lengths, seg
    )
    ids = np.asarray(ids)
    assert (ids >= 0).all()
    assert (ids + seg <= np.asarray(lengths)).all()


def test_interpolate_unvoiced():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0], dtype=np.float32)
    out, uv = dsp.interpolate_unvoiced(f0)
    assert (out > 0).all()
    np.testing.assert_allclose(out[2], 100.0)
    np.testing.assert_allclose(out[5], 200.0)
    np.testing.assert_allclose(out[3], 100 + (200 - 100) / 3, rtol=1e-5)
    np.testing.assert_array_equal(uv, [0, 0, 1, 0, 0, 1, 0])
