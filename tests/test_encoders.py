"""Parity test: Wav2Vec2Encoder vs the reference's vendored bshall HuBERT."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from vencoder.hubert import hubert_model as ref_hubert  # noqa: E402

from sovits_tpu.encoders import (  # noqa: E402
    Wav2Vec2Config,
    Wav2Vec2Encoder,
    from_bshall_hubert,
)


def test_wav2vec2_matches_bshall_hubert_soft():
    torch.manual_seed(0)
    ref = ref_hubert.HubertSoft()
    ref.eval()

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref_units = ref.units(torch.from_numpy(wav)[None, None]).numpy()[0]

    cfg = Wav2Vec2Config(final_proj_dim=256)
    enc = Wav2Vec2Encoder(cfg)
    params = {"params": jax.tree.map(jnp.asarray, from_bshall_hubert(state_dict_numpy(ref)))}
    wav_padded = np.pad(wav, (40, 40))
    got = np.asarray(enc.apply(params, jnp.asarray(wav_padded[None])))[0]

    assert got.shape == ref_units.shape
    np.testing.assert_allclose(got, ref_units, rtol=5e-3, atol=2e-4)


def test_frame_rate_contract():
    """50 fps at 16 kHz: one frame per 320 samples (vencoder contract)."""
    cfg = Wav2Vec2Config(n_layers=1, output_layer=1)
    enc = Wav2Vec2Encoder(cfg)
    wav = jnp.zeros((1, 16000 + 80))
    params = enc.init(jax.random.PRNGKey(0), wav)
    out = enc.apply(params, wav)
    assert out.shape[1] == (16000 + 80 - 400) // 320 + 1
    assert out.shape[2] == 768
