"""Parity: FCPE (PCmer performer-conformer) vs the vendored reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from modules.F0Predictor.fcpe.model import FCPE as RefFCPE  # noqa: E402

from sovits_tpu.f0.fcpe import (  # noqa: E402
    FcpeNet,
    cents_local_decoder,
    convert_fcpe_state_dict,
)


def _pair(n_layers=2, n_chans=64, mels=16, out_dims=40):
    torch.manual_seed(0)
    ref = RefFCPE(
        input_channel=mels, out_dims=out_dims, n_layers=n_layers, n_chans=n_chans,
        use_siren=False, use_full=False, confidence=False,
    )
    ref.eval()
    mine = FcpeNet(input_channel=mels, out_dims=out_dims, n_layers=n_layers, n_chans=n_chans)
    params = {"params": jax.tree.map(jnp.asarray, convert_fcpe_state_dict(state_dict_numpy(ref), n_layers))}
    return ref, mine, params


def test_fcpe_salience_matches_reference():
    ref, mine, params = _pair()
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 24, 16)).astype(np.float32)

    # reference salience = model internals up to sigmoid (forward(infer=True)
    # also decodes; tap the salience by replicating its head path)
    with torch.no_grad():
        x = ref.stack(torch.from_numpy(mel.transpose(0, 2, 1))).transpose(1, 2)
        x = ref.decoder(x)
        x = ref.norm(x)
        x = torch.sigmoid(ref.dense_out(x)).numpy()

    got = np.asarray(mine.apply(params, jnp.asarray(mel)))
    assert got.shape == x.shape
    np.testing.assert_allclose(got, x, rtol=2e-3, atol=2e-4)


def test_fcpe_decode_matches_reference():
    ref, mine, params = _pair()
    rng = np.random.default_rng(1)
    sal = rng.uniform(0, 1, (1, 10, 40)).astype(np.float32)

    with torch.no_grad():
        ref.threshold = 0.05
        cents = ref.cents_local_decoder(torch.from_numpy(sal))
        ref_f0 = ref.cent_to_f0(cents).numpy()[0, :, 0]
    ref_f0 = np.where(np.isfinite(ref_f0), ref_f0, 0.0)

    got = cents_local_decoder(sal[0], mine.cent_table, 0.05)
    np.testing.assert_allclose(got, ref_f0, rtol=1e-4, atol=1e-4)


def test_fcpe_cent_table_matches():
    ref, mine, _ = _pair()
    np.testing.assert_allclose(mine.cent_table, ref.cent_table.numpy(), rtol=1e-5)
