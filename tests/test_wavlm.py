"""Parity: WavLM encoder (gated rel-pos attention) vs the vendored reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from vencoder.wavlm.WavLM import WavLM, WavLMConfig  # noqa: E402

from sovits_tpu.encoders.wavlm import (  # noqa: E402
    WavLMDims,
    WavLMEncoder,
    convert_wavlm_state_dict,
    relative_position_buckets,
)


def test_relative_buckets_match_reference():
    from vencoder.wavlm.modules import MultiheadAttention

    mha = MultiheadAttention(16, 4, has_relative_attention_bias=True,
                             num_buckets=32, max_distance=80, self_attention=True)
    ctx = torch.arange(20)[:, None]
    mem = torch.arange(20)[None, :]
    ref = mha._relative_positions_bucket(mem - ctx, bidirectional=True).numpy()
    got = relative_position_buckets(20, 32, 80)
    np.testing.assert_array_equal(got, ref)


def test_wavlm_matches_reference():
    torch.manual_seed(0)
    cfg = WavLMConfig(
        {
            "encoder_layers": 2,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4,
            "relative_position_embedding": True,
            "gru_rel_pos": True,
            "num_buckets": 32,
            "max_distance": 80,
            "encoder_layerdrop": 0.0,
            "dropout": 0.0,
            "attention_dropout": 0.0,
            "activation_dropout": 0.0,
            "dropout_input": 0.0,
            "dropout_features": 0.0,
        }
    )
    ref = WavLM(cfg)
    ref.eval()

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref_out = ref.extract_features(torch.from_numpy(wav)[None])[0].numpy()

    dims = WavLMDims(d_model=64, n_layers=2, n_heads=4, ffn_dim=128,
                     num_buckets=32, max_distance=80)
    enc = WavLMEncoder(dims)
    sd = state_dict_numpy(ref)
    params = {"params": jax.tree.map(jnp.asarray, convert_wavlm_state_dict(sd, dims))}
    got = np.asarray(enc.apply(params, jnp.asarray(wav[None])))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-4)
