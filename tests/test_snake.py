"""Parity: alias-free snake activations + snake generator vs reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from vdecoder.hifiganwithsnake import models as ref_snake_models  # noqa: E402
from vdecoder.hifiganwithsnake.alias import act as ref_act  # noqa: E402

from sovits_tpu.convert import from_torch as ft  # noqa: E402
from sovits_tpu.models.snake_hifigan import SnakeGenerator  # noqa: E402
from sovits_tpu.nn.snake import SnakeAlias, downsample2x, kaiser_sinc_filter1d, upsample2x  # noqa: E402

from tests.test_models import SMALL_H, no_torch_randomness  # noqa: E402


def test_kaiser_filter_matches_reference():
    from vdecoder.hifiganwithsnake.alias.filter import kaiser_sinc_filter1d as ref_filt

    ref = ref_filt(0.25, 0.3, 12).numpy().ravel()
    got = kaiser_sinc_filter1d(0.25, 0.3, 12)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_up_down_sample_match_reference():
    from vdecoder.hifiganwithsnake.alias.resample import DownSample1d, UpSample1d

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 50)).astype(np.float32)  # [B, C, T]

    up = UpSample1d(2, 12, C=4)
    down = DownSample1d(2, 12, C=4)
    with torch.no_grad():
        ref_up = up(torch.from_numpy(x)).numpy()
        ref_down = down(torch.from_numpy(x)).numpy()

    got_up = np.asarray(upsample2x(jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    got_down = np.asarray(downsample2x(jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(got_up, ref_up, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_down, ref_down, rtol=1e-4, atol=1e-5)


def test_snake_alias_matches_reference():
    torch.manual_seed(0)
    ref = ref_act.SnakeAlias(6, C=6)
    with torch.no_grad():
        ref.act.alpha.normal_(0, 0.3)
        ref.act.beta.normal_(0, 0.3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 40)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    m = SnakeAlias()
    sd = state_dict_numpy(ref)
    params = {"params": {"act": {"alpha": sd["act.alpha"], "beta": sd["act.beta"]}}}
    got = np.asarray(m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(got, out_ref, rtol=1e-4, atol=1e-5)


def test_snake_generator_matches_reference():
    torch.manual_seed(1)
    ref_gen = ref_snake_models.Generator(SMALL_H)
    ref_gen.eval()
    b, t_frames = 1, 20
    rng = np.random.default_rng(2)
    x = rng.standard_normal((b, t_frames, SMALL_H["inter_channels"])).astype(np.float32)
    f0 = np.where(
        rng.uniform(size=(b, t_frames)) > 0.3,
        rng.uniform(80, 400, size=(b, t_frames)),
        0.0,
    ).astype(np.float32)
    g = rng.standard_normal((b, 1, SMALL_H["gin_channels"])).astype(np.float32)

    with no_torch_randomness(), torch.no_grad():
        ref = ref_gen(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(f0),
            g=torch.from_numpy(g.transpose(0, 2, 1)),
        ).numpy()

    gen = SnakeGenerator(
        sampling_rate=SMALL_H["sampling_rate"],
        inter_channels=SMALL_H["inter_channels"],
        resblock=SMALL_H["resblock"],
        resblock_kernel_sizes=tuple(SMALL_H["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(map(tuple, SMALL_H["resblock_dilation_sizes"])),
        upsample_rates=tuple(SMALL_H["upsample_rates"]),
        upsample_initial_channel=SMALL_H["upsample_initial_channel"],
        upsample_kernel_sizes=tuple(SMALL_H["upsample_kernel_sizes"]),
        gin_channels=SMALL_H["gin_channels"],
    )
    params = {
        "params": jax.tree.map(
            jnp.asarray,
            ft.snake_hifigan_generator(
                state_dict_numpy(ref_gen), n_upsamples=2, n_kernels=2
            ),
        )
    }
    got = np.asarray(
        gen.apply(params, jnp.asarray(x), jnp.asarray(f0), g=jnp.asarray(g), rng=None)
    ).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4)
