"""Parity: Whisper audio encoder + log-mel vs the vendored reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from vencoder.whisper import model as ref_whisper  # noqa: E402

from sovits_tpu.encoders.whisper import (  # noqa: E402
    HOP,
    N_FFT,
    WhisperAudioEncoder,
    WhisperDims,
    convert_whisper_encoder,
    log_mel_spectrogram,
)


def test_log_mel_matches_whisper_formula():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    # whisper audio.py:91-124 restated in torch
    window = torch.hann_window(N_FFT)
    stft = torch.stft(
        torch.from_numpy(wav), N_FFT, HOP, window=window, return_complex=True
    )
    magnitudes = stft[..., :-1].abs() ** 2  # [F, T-1]
    from sovits_tpu.dsp.mel import mel_filterbank

    fbank = torch.from_numpy(mel_filterbank(16000, N_FFT, 80).T.copy())
    mel = fbank @ magnitudes
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    ref = ((log_spec + 4.0) / 4.0).numpy().T  # [T, M]

    got = np.asarray(log_mel_spectrogram(jnp.asarray(wav[None])))[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_whisper_encoder_matches_reference():
    torch.manual_seed(0)
    dims = WhisperDims(n_mels=20, n_audio_ctx=50, n_audio_state=32, n_audio_head=4, n_audio_layer=2)
    ref = ref_whisper.AudioEncoder(
        dims.n_mels, dims.n_audio_ctx, dims.n_audio_state, dims.n_audio_head, dims.n_audio_layer
    )
    ref.eval()

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 40, dims.n_mels)).astype(np.float32)  # T=40 -> 20

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()

    sd = {f"encoder.{k}": v for k, v in state_dict_numpy(ref).items()}
    enc = WhisperAudioEncoder(dims)
    params = {
        "params": jax.tree.map(
            jnp.asarray, convert_whisper_encoder(sd, dims.n_audio_layer)
        )
    }
    got = np.asarray(enc.apply(params, jnp.asarray(mel)))
    assert got.shape == out_ref.shape
    np.testing.assert_allclose(got, out_ref, rtol=1e-4, atol=1e-5)
