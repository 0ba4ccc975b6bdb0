"""Parity: RMVPE net vs the vendored reference implementation."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from modules.F0Predictor.rmvpe.model import E2E0  # noqa: E402

from sovits_tpu.f0.rmvpe import (  # noqa: E402
    RmvpeNet,
    convert_rmvpe_state_dict,
    rmvpe_mel,
    to_local_average_cents,
)


def test_rmvpe_net_matches_reference():
    torch.manual_seed(0)
    ref = E2E0(4, 1, (2, 2))
    ref.eval()

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 32, 128)).astype(np.float32) * 0.5  # [B, T, M]

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()  # in [B,M,T]

    net = RmvpeNet()
    variables = jax.tree.map(jnp.asarray, convert_rmvpe_state_dict(state_dict_numpy(ref)))
    got = np.asarray(net.apply(variables, jnp.asarray(mel)))
    assert got.shape == out_ref.shape == (1, 32, 360)
    np.testing.assert_allclose(got, out_ref, rtol=1e-3, atol=1e-4)


def test_rmvpe_mel_matches_reference_formula():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    # spec.py MelSpectrogram restated (htk mel, center=True, clamp 1e-5)
    from sovits_tpu.dsp.mel import mel_filterbank

    window = torch.hann_window(1024)
    fft = torch.stft(torch.from_numpy(wav), 1024, 160, 1024, window=window,
                     center=True, return_complex=True)
    mag = fft.abs()
    fbank = torch.from_numpy(mel_filterbank(16000, 1024, 128, 30, 8000, htk=True).T.copy())
    ref = torch.log(torch.clamp(fbank @ mag, min=1e-5)).numpy().T

    got = np.asarray(rmvpe_mel(jnp.asarray(wav[None])))[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_local_average_cents_decode():
    sal = np.zeros((3, 360), np.float32)
    sal[0, 100] = 1.0  # exact peak
    sal[1, 100] = 0.5
    sal[1, 101] = 0.5  # between bins
    # frame 2 below threshold -> 0
    cents = to_local_average_cents(sal, thred=0.05)
    from sovits_tpu.f0.rmvpe import CENTS_CONST

    np.testing.assert_allclose(cents[0], 20 * 100 + CENTS_CONST, rtol=1e-6)
    np.testing.assert_allclose(cents[1], 20 * 100.5 + CENTS_CONST, rtol=1e-6)
    assert cents[2] == 0.0
