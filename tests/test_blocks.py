"""Parity tests: sovits_tpu.nn blocks vs the reference torch modules.

Each test instantiates the reference module (random torch init), converts
its weights through sovits_tpu.convert.from_torch, and checks outputs match
on identical inputs. Layout: reference is [B, C, T], ours is [B, T, C].
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

import modules.attentions as ref_attentions  # noqa: E402
import modules.modules as ref_modules  # noqa: E402

from sovits_tpu import nn as snn  # noqa: E402
from sovits_tpu.convert import from_torch as ft  # noqa: E402

ATOL = 2e-5
RTOL = 2e-5


def to_jax(x_torch):  # [B, C, T] -> [B, T, C]
    return jnp.asarray(x_torch.numpy().transpose(0, 2, 1))


def from_jax(y):  # [B, T, C] -> [B, C, T] numpy
    return np.asarray(y).transpose(0, 2, 1)


def rand(b, c, t, seed):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(b, c, t, generator=g)


def test_conv1d_weight_norm_matches_torch():
    torch.manual_seed(0)
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(16, 32, 5, dilation=2, padding=4))
    conv.eval()
    x = rand(2, 16, 30, 1)
    with torch.no_grad():
        ref = conv(x).numpy()

    m = snn.Conv1d(features=32, kernel_size=5, dilation=2, padding=4, weight_norm=True)
    params = {"params": jax.tree.map(jnp.asarray, ft.conv1d_wn(state_dict_numpy(conv)))}
    got = from_jax(m.apply(params, to_jax(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_conv_transpose1d_weight_norm_matches_torch():
    torch.manual_seed(1)
    conv = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(32, 16, 16, 8, padding=4))
    conv.eval()
    x = rand(2, 32, 20, 2)
    with torch.no_grad():
        ref = conv(x).numpy()

    m = snn.ConvTranspose1d(features=16, kernel_size=16, stride=8, padding=4, weight_norm=True)
    params = {
        "params": jax.tree.map(jnp.asarray, ft.conv_transpose1d_wn(state_dict_numpy(conv)))
    }
    got = from_jax(m.apply(params, to_jax(x)))
    assert got.shape == ref.shape  # (20-1)*8 - 8 + 16 = 160
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_grouped_conv_matches_torch():
    torch.manual_seed(2)
    conv = torch.nn.Conv1d(16, 64, 41, stride=4, groups=4, padding=20)
    conv.eval()
    x = rand(2, 16, 100, 3)
    with torch.no_grad():
        ref = conv(x).numpy()
    m = snn.Conv1d(features=64, kernel_size=41, stride=4, groups=4, padding=20)
    params = {"params": jax.tree.map(jnp.asarray, ft.conv1d(state_dict_numpy(conv)))}
    got = from_jax(m.apply(params, to_jax(x)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("gin", [0, 32])
def test_wavenet_matches_reference_wn(gin):
    torch.manual_seed(3)
    ref_wn = ref_modules.WN(64, 5, 1, 4, gin_channels=gin)
    ref_wn.eval()
    x = rand(2, 64, 40, 4)
    mask = torch.ones(2, 1, 40)
    mask[1, :, 25:] = 0
    g = rand(2, gin, 1, 5) if gin else None
    with torch.no_grad():
        ref = (ref_wn(x, mask, g=g)).numpy()

    m = snn.WaveNet(hidden_channels=64, kernel_size=5, dilation_rate=1, n_layers=4, gin_channels=gin)
    params = {"params": jax.tree.map(jnp.asarray, ft.wavenet(state_dict_numpy(ref_wn)))}
    got = from_jax(
        m.apply(
            params,
            to_jax(x),
            to_jax(mask),
            g=to_jax(g) if gin else None,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_encoder_matches_reference_rel_pos_attention():
    torch.manual_seed(4)
    ref_enc = ref_attentions.Encoder(64, 128, 2, 2, kernel_size=3, p_dropout=0.0, window_size=4)
    ref_enc.eval()
    x = rand(2, 64, 37, 6)
    mask = torch.ones(2, 1, 37)
    mask[1, :, 30:] = 0
    with torch.no_grad():
        ref = ref_enc(x * mask, mask).numpy()

    m = snn.Encoder(hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2, kernel_size=3)
    params = {"params": jax.tree.map(jnp.asarray, ft.attn_encoder(state_dict_numpy(ref_enc)))}
    got = from_jax(m.apply(params, to_jax(x * mask), to_jax(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("isflow", [False, True])
def test_fft_matches_reference(isflow):
    torch.manual_seed(5)
    kwargs = {"gin_channels": 32} if isflow else {}
    ref_fft = ref_attentions.FFT(64, 128, 2, 2, kernel_size=3, p_dropout=0.0, isflow=isflow, **kwargs)
    ref_fft.eval()
    x = rand(2, 64, 29, 7)
    mask = torch.ones(2, 1, 29)
    mask[0, :, 20:] = 0
    g = rand(2, 32, 1, 8) if isflow else None
    with torch.no_grad():
        ref = ref_fft(x, mask, g=g).numpy()

    m = snn.FFT(
        hidden_channels=64,
        filter_channels=128,
        n_heads=2,
        n_layers=2,
        kernel_size=3,
        isflow=isflow,
        gin_channels=32 if isflow else 0,
    )
    params = {"params": jax.tree.map(jnp.asarray, ft.attn_fft(state_dict_numpy(ref_fft)))}
    got = from_jax(m.apply(params, to_jax(x), to_jax(mask), g=to_jax(g) if isflow else None))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("share", [False, True])
def test_residual_coupling_block_forward_and_reverse(share):
    import models as ref_models  # SynthesizerTrn module file (torch-only deps)

    torch.manual_seed(6)
    ref_block = ref_models.ResidualCouplingBlock(
        64, 64, 5, 1, 2, n_flows=2, gin_channels=32, share_parameter=share
    )
    ref_block.eval()
    x = rand(2, 64, 25, 9)
    mask = torch.ones(2, 1, 25)
    g = rand(2, 32, 1, 10)
    with torch.no_grad():
        ref_fwd = ref_block(x, mask, g=g).numpy()
        ref_rev = ref_block(x, mask, g=g, reverse=True).numpy()

    m = snn.ResidualCouplingBlock(
        channels=64,
        hidden_channels=64,
        kernel_size=5,
        dilation_rate=1,
        n_layers=2,
        n_flows=2,
        gin_channels=32,
        share_parameter=share,
    )
    params = {
        "params": jax.tree.map(
            jnp.asarray,
            ft.coupling_block(state_dict_numpy(ref_block), n_flows=2, share_parameter=share),
        )
    }
    got_fwd = from_jax(m.apply(params, to_jax(x), to_jax(mask), g=to_jax(g)))
    got_rev = from_jax(m.apply(params, to_jax(x), to_jax(mask), g=to_jax(g), reverse=True))
    np.testing.assert_allclose(got_fwd, ref_fwd, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_rev, ref_rev, rtol=1e-4, atol=1e-5)


def test_resblock1_matches_reference():
    torch.manual_seed(7)
    ref_rb = ref_modules.ResBlock1(32, 3, (1, 3, 5))
    ref_rb.eval()
    x = rand(2, 32, 50, 11)
    with torch.no_grad():
        ref = ref_rb(x).numpy()
    m = snn.ResBlock1(channels=32, kernel_size=3, dilations=(1, 3, 5))
    sd = state_dict_numpy(ref_rb)
    params = {
        "params": jax.tree.map(
            jnp.asarray,
            {
                **{f"conv1_{j}": ft.conv1d_wn(sd, f"convs1.{j}.") for j in range(3)},
                **{f"conv2_{j}": ft.conv1d_wn(sd, f"convs2.{j}.") for j in range(3)},
            },
        )
    }
    got = from_jax(m.apply(params, to_jax(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_reference():
    torch.manual_seed(8)
    ref_ln = ref_modules.LayerNorm(48)
    with torch.no_grad():
        ref_ln.gamma.normal_()
        ref_ln.beta.normal_()
    x = rand(2, 48, 30, 12)
    with torch.no_grad():
        ref = ref_ln(x).numpy()
    m = snn.LayerNorm()
    params = {"params": jax.tree.map(jnp.asarray, ft.layer_norm(state_dict_numpy(ref_ln)))}
    got = from_jax(m.apply(params, to_jax(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fold_weight_norm_preserves_outputs():
    torch.manual_seed(9)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 30, 16), ), dtype=jnp.float32)
    m = snn.Conv1d(features=32, kernel_size=5, padding=2, weight_norm=True)
    params = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)

    folded = snn.fold_weight_norm(params["params"])
    m2 = snn.Conv1d(features=32, kernel_size=5, padding=2, weight_norm=False)
    got = m2.apply({"params": folded}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
