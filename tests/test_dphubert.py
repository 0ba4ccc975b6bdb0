"""Parity: DPHuBERT (pruned torchaudio wav2vec2) vs the vendored reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from vencoder.dphubert.model import wav2vec2_model  # noqa: E402

from sovits_tpu.encoders.dphubert import (  # noqa: E402
    DPHubertEncoder,
    convert_dphubert_state_dict,
)

SMALL_CFG = dict(
    extractor_mode="group_norm",
    extractor_conv_layer_config=[(64, 10, 5), (64, 3, 2), (64, 2, 2)],
    extractor_conv_bias=False,
    encoder_embed_dim=48,
    encoder_projection_dropout=0.0,
    encoder_pos_conv_kernel=16,
    encoder_pos_conv_groups=4,
    encoder_num_layers=3,
    # pruned: layer 1 has no attention, layer 2 has no feed-forward
    encoder_use_attention=[True, False, True],
    encoder_use_feed_forward=[True, True, False],
    encoder_num_heads=[4, 0, 2],
    encoder_head_dim=12,
    encoder_attention_dropout=0.0,
    encoder_ff_interm_features=[96, 64, 0],
    encoder_ff_interm_dropout=0.0,
    encoder_dropout=0.0,
    encoder_layer_norm_first=False,
    encoder_layer_drop=0.0,
    aux_num_out=None,
    normalize_waveform=False,
)


def test_dphubert_matches_reference():
    torch.manual_seed(0)
    ref = wav2vec2_model(**SMALL_CFG)
    ref.eval()

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(4000) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(wav)[None])[0].numpy()

    cfg = {k: v for k, v in SMALL_CFG.items() if k != "aux_num_out"}
    enc = DPHubertEncoder(cfg)
    params = {
        "params": jax.tree.map(
            jnp.asarray, convert_dphubert_state_dict(state_dict_numpy(ref), cfg)
        )
    }
    got = np.asarray(enc.apply(params, jnp.asarray(wav[None])))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=2e-4)
