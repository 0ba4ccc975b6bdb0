"""Parity tests: models vs the reference torch implementation.

Randomness is disabled on both sides (torch.rand/randn_like patched to
zeros / fixed values; our modules run with rng=None / deterministic=True),
so outputs must match to float32 tolerance.
"""

import contextlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

import models as ref_models  # noqa: E402
from vdecoder.hifigan import models as ref_hifigan  # noqa: E402

from sovits_tpu.convert import from_torch as ft  # noqa: E402
from sovits_tpu.models import (  # noqa: E402
    Generator,
    MultiPeriodDiscriminator,
    Synthesizer,
    sine_source,
)

SMALL_H = {
    "sampling_rate": 8000,
    "inter_channels": 32,
    "resblock": "1",
    "resblock_kernel_sizes": [3, 5],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
    "upsample_rates": [4, 4],
    "upsample_initial_channel": 32,
    "upsample_kernel_sizes": [8, 8],
    "gin_channels": 16,
    "use_depthwise_conv": False,
}


@contextlib.contextmanager
def no_torch_randomness():
    """Zero out torch randomness used by SineGen / sampling paths."""
    orig_rand = torch.rand
    orig_randn_like = torch.randn_like
    orig_uniform = torch.Tensor.uniform_

    def fake_rand(*args, **kwargs):
        kwargs.pop("generator", None)
        return torch.zeros(*args, **{k: v for k, v in kwargs.items() if k in ("device", "dtype")})

    def fake_randn_like(x, **kwargs):
        return torch.zeros_like(x)

    def fake_uniform(self, a=0.0, b=1.0):
        return self.fill_(1.0)

    torch.rand = fake_rand
    torch.randn_like = fake_randn_like
    torch.Tensor.uniform_ = fake_uniform
    try:
        yield
    finally:
        torch.rand = orig_rand
        torch.randn_like = orig_randn_like
        torch.Tensor.uniform_ = orig_uniform


def test_sine_source_matches_reference_sinegen():
    torch.manual_seed(0)
    sg = ref_hifigan.SineGen(8000, harmonic_num=8)
    t_frames, upp = 40, 16
    rng = np.random.default_rng(0)
    f0_frames = np.where(
        rng.uniform(size=(1, t_frames)) > 0.3,
        rng.uniform(80, 400, size=(1, t_frames)),
        0.0,
    ).astype(np.float32)

    # reference consumes f0 at sample rate
    f0_up = np.repeat(f0_frames, upp, axis=1)[..., None]  # [B, T, 1]
    with no_torch_randomness(), torch.no_grad():
        ref_sines, ref_uv, _ = sg(torch.from_numpy(f0_up))

    got_sines, got_uv = sine_source(jnp.asarray(f0_frames), upp, 8000, 8, rng=None)
    np.testing.assert_allclose(np.asarray(got_uv), ref_uv.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_sines), ref_sines.numpy(), rtol=1e-3, atol=2e-4
    )


def _make_ref_generator():
    torch.manual_seed(1)
    return ref_hifigan.Generator(SMALL_H)


def test_nsf_hifigan_generator_matches_reference():
    ref_gen = _make_ref_generator()
    ref_gen.eval()
    b, t_frames = 2, 30
    rng = np.random.default_rng(1)
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

    gen = Generator(
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
            ft.nsf_hifigan_generator(
                state_dict_numpy(ref_gen),
                n_upsamples=2,
                n_kernels=2,
            ),
        )
    }
    got = gen.apply(params, jnp.asarray(x), jnp.asarray(f0), g=jnp.asarray(g), rng=None)
    got = np.asarray(got).transpose(0, 2, 1)  # [B, 1, T]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_multi_period_discriminator_matches_reference():
    torch.manual_seed(2)
    ref_mpd = ref_models.MultiPeriodDiscriminator(use_spectral_norm=False)
    ref_mpd.eval()
    rng = np.random.default_rng(2)
    y = rng.standard_normal((2, 1, 480)).astype(np.float32) * 0.3
    y_hat = rng.standard_normal((2, 1, 480)).astype(np.float32) * 0.3

    with torch.no_grad():
        r_logits, g_logits, r_fmaps, g_fmaps = ref_mpd(
            torch.from_numpy(y), torch.from_numpy(y_hat)
        )

    mpd = MultiPeriodDiscriminator()
    params = {
        "params": jax.tree.map(
            jnp.asarray, ft.multi_period_discriminator(state_dict_numpy(ref_mpd))
        )
    }
    got_r, got_g, got_rf, got_gf = mpd.apply(
        params, jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(y_hat.transpose(0, 2, 1))
    )
    assert len(got_r) == len(r_logits) == 6

    def to_torch_order(a):
        """channels-last fmap -> torch channels-first layout.

        DiscriminatorS: [B, T, C] -> [B, C, T];
        DiscriminatorP: [B, T', P, C] -> [B, C, T', P]."""
        a = np.asarray(a)
        if a.ndim == 3:
            return a.transpose(0, 2, 1)
        return a.transpose(0, 3, 1, 2)

    # logits element-wise in matched order (both flatten time-major)
    for mine, ref in zip(got_r, r_logits):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().reshape(ref.shape[0], -1),
            rtol=1e-3, atol=1e-4,
        )
    for mine, ref in zip(got_g, g_logits):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().reshape(ref.shape[0], -1),
            rtol=1e-3, atol=1e-4,
        )
    # feature maps element-wise (they drive the FM loss, train.py:200-207)
    for mf, rf in zip(got_rf + got_gf, r_fmaps + g_fmaps):
        for m1, r1 in zip(mf, rf):
            np.testing.assert_allclose(
                to_torch_order(m1), r1.numpy(), rtol=1e-3, atol=1e-4
            )


SYN_KW = dict(
    spec_channels=65,
    segment_size=8,
    inter_channels=32,
    hidden_channels=32,
    filter_channels=64,
    n_heads=2,
    n_layers=2,
    kernel_size=3,
    p_dropout=0.0,
    resblock="1",
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    upsample_rates=(4, 4),
    upsample_initial_channel=32,
    upsample_kernel_sizes=(8, 8),
    gin_channels=16,
    ssl_dim=24,
    n_speakers=4,
    sampling_rate=8000,
    vol_embedding=True,
    use_automatic_f0_prediction=True,
    n_flow_layer=2,
)


def _ref_synthesizer():
    torch.manual_seed(3)
    return ref_models.SynthesizerTrn(
        spec_channels=SYN_KW["spec_channels"],
        segment_size=SYN_KW["segment_size"],
        inter_channels=SYN_KW["inter_channels"],
        hidden_channels=SYN_KW["hidden_channels"],
        filter_channels=SYN_KW["filter_channels"],
        n_heads=SYN_KW["n_heads"],
        n_layers=SYN_KW["n_layers"],
        kernel_size=SYN_KW["kernel_size"],
        p_dropout=SYN_KW["p_dropout"],
        resblock=SYN_KW["resblock"],
        resblock_kernel_sizes=list(SYN_KW["resblock_kernel_sizes"]),
        resblock_dilation_sizes=[list(d) for d in SYN_KW["resblock_dilation_sizes"]],
        upsample_rates=list(SYN_KW["upsample_rates"]),
        upsample_initial_channel=SYN_KW["upsample_initial_channel"],
        upsample_kernel_sizes=list(SYN_KW["upsample_kernel_sizes"]),
        gin_channels=SYN_KW["gin_channels"],
        ssl_dim=SYN_KW["ssl_dim"],
        n_speakers=SYN_KW["n_speakers"],
        sampling_rate=SYN_KW["sampling_rate"],
        vol_embedding=SYN_KW["vol_embedding"],
        use_automatic_f0_prediction=SYN_KW["use_automatic_f0_prediction"],
        n_flow_layer=SYN_KW["n_flow_layer"],
    )


def _syn_inputs(b=2, t=24):
    rng = np.random.default_rng(3)
    c = rng.standard_normal((b, t, SYN_KW["ssl_dim"])).astype(np.float32)
    f0 = np.where(
        rng.uniform(size=(b, t)) > 0.3, rng.uniform(80, 400, size=(b, t)), 0.0
    ).astype(np.float32)
    uv = (f0 > 0).astype(np.float32)
    spec = np.abs(rng.standard_normal((b, t, SYN_KW["spec_channels"]))).astype(np.float32)
    vol = np.abs(rng.standard_normal((b, t))).astype(np.float32) * 0.1
    spk = np.array([0, 2][:b], dtype=np.int32)
    c, f0, uv, spec, vol = c[:b], f0[:b], uv[:b], spec[:b], vol[:b]
    return c, f0, uv, spec, vol, spk


def _convert_syn_params(ref_syn):
    return {
        "params": jax.tree.map(
            jnp.asarray,
            ft.synthesizer(
                state_dict_numpy(ref_syn),
                n_flows=4,
                vol_embedding=True,
                n_upsamples=2,
                n_resblock_kernels=2,
            ),
        )
    }


@pytest.fixture(scope="module")
def syn_pair():
    ref_syn = _ref_synthesizer()
    ref_syn.eval()
    syn = Synthesizer(**SYN_KW)
    params = _convert_syn_params(ref_syn)
    return ref_syn, syn, params


def test_synthesizer_infer_matches_reference(syn_pair):
    ref_syn, syn, params = syn_pair
    c, f0, uv, spec, vol, spk = _syn_inputs(b=1)

    with no_torch_randomness(), torch.no_grad():
        ref_o, ref_f0 = ref_syn.infer(
            torch.from_numpy(c.transpose(0, 2, 1)),
            torch.from_numpy(f0),
            torch.from_numpy(uv),
            g=torch.from_numpy(spk.astype(np.int64)),
            noice_scale=0.0,
            vol=torch.from_numpy(vol),
        )

    got_o, got_f0 = syn.apply(
        params,
        jnp.asarray(c),
        jnp.asarray(f0),
        jnp.asarray(uv),
        jnp.asarray(spk),
        noise_scale=0.0,
        vol=jnp.asarray(vol),
        sample_noise=False,
        method=Synthesizer.infer,
    )
    np.testing.assert_allclose(np.asarray(got_f0), ref_f0.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_o)[..., 0], ref_o.numpy()[:, 0, :], rtol=2e-3, atol=3e-4
    )


def test_synthesizer_infer_predict_f0_matches_reference(syn_pair):
    ref_syn, syn, params = syn_pair
    c, f0, uv, spec, vol, spk = _syn_inputs(b=1)

    with no_torch_randomness(), torch.no_grad():
        ref_o, ref_f0 = ref_syn.infer(
            torch.from_numpy(c.transpose(0, 2, 1)),
            torch.from_numpy(f0),
            torch.from_numpy(uv),
            g=torch.from_numpy(spk.astype(np.int64)),
            noice_scale=0.0,
            predict_f0=True,
            vol=torch.from_numpy(vol),
        )

    got_o, got_f0 = syn.apply(
        params,
        jnp.asarray(c),
        jnp.asarray(f0),
        jnp.asarray(uv),
        jnp.asarray(spk),
        noise_scale=0.0,
        predict_f0=True,
        vol=jnp.asarray(vol),
        sample_noise=False,
        method=Synthesizer.infer,
    )
    np.testing.assert_allclose(np.asarray(got_f0), ref_f0.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got_o)[..., 0], ref_o.numpy()[:, 0, :], rtol=2e-3, atol=3e-4
    )


def test_synthesizer_training_forward_matches_reference(syn_pair):
    ref_syn, syn, params = syn_pair
    c, f0, uv, spec, vol, spk = _syn_inputs()
    lengths = np.array([24, 24], dtype=np.int32)

    with no_torch_randomness(), torch.no_grad():
        ref_out = ref_syn(
            torch.from_numpy(c.transpose(0, 2, 1)),
            torch.from_numpy(f0),
            torch.from_numpy(uv),
            torch.from_numpy(spec.transpose(0, 2, 1)),
            g=torch.from_numpy(spk.astype(np.int64)[:, None]),
            c_lengths=torch.from_numpy(lengths),
            spec_lengths=torch.from_numpy(lengths),
            vol=torch.from_numpy(vol),
        )
    ref_o, ref_ids, _, (ref_z, ref_zp, ref_mp, ref_logsp, ref_mq, ref_logsq), ref_pred_lf0, ref_norm_lf0, ref_lf0 = ref_out

    got = syn.apply(
        params,
        jnp.asarray(c),
        jnp.asarray(f0),
        jnp.asarray(uv),
        jnp.asarray(spec),
        jnp.asarray(spk),
        jnp.asarray(lengths),
        vol=jnp.asarray(vol),
        deterministic=True,
    )
    got_o, got_ids, _, (got_z, got_zp, got_mp, got_logsp, got_mq, got_logsq), got_pred_lf0, got_norm_lf0, got_lf0 = got

    np.testing.assert_array_equal(np.asarray(got_ids), ref_ids.numpy())
    for mine, ref in [
        (got_z, ref_z),
        (got_zp, ref_zp),
        (got_mp, ref_mp),
        (got_logsp, ref_logsp),
        (got_mq, ref_mq),
        (got_logsq, ref_logsq),
    ]:
        np.testing.assert_allclose(
            np.asarray(mine).transpose(0, 2, 1), ref.numpy(), rtol=1e-3, atol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(got_pred_lf0).transpose(0, 2, 1), ref_pred_lf0.numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_norm_lf0).transpose(0, 2, 1), ref_norm_lf0.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_o)[..., 0], ref_o.numpy()[:, 0, :], rtol=2e-3, atol=3e-4
    )


def test_spectral_norm_discriminator_matches_reference():
    """use_spectral_norm=True variant (models.py:168,203): eval-mode parity
    vs torch's spectral_norm (stored u/v, no power iteration), plus the
    power-iteration update path under mutable 'spectral'."""
    torch.manual_seed(5)
    ref_mpd = ref_models.MultiPeriodDiscriminator(use_spectral_norm=True)
    ref_mpd.eval()
    rng = np.random.default_rng(5)
    y = rng.standard_normal((1, 1, 330)).astype(np.float32) * 0.3
    with torch.no_grad():
        r_logits, _, r_fmaps, _ = ref_mpd(torch.from_numpy(y), torch.from_numpy(y))

    mpd = MultiPeriodDiscriminator(use_spectral_norm=True)
    variables = jax.tree.map(
        jnp.asarray,
        ft.multi_period_discriminator_spectral(state_dict_numpy(ref_mpd)),
    )
    got_r, _, got_rf, _ = mpd.apply(
        variables, jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(y.transpose(0, 2, 1))
    )
    for mine, ref in zip(got_r, r_logits):
        np.testing.assert_allclose(
            np.asarray(mine), ref.numpy().reshape(ref.shape[0], -1),
            rtol=2e-3, atol=2e-4,
        )

    # training path: power iteration mutates u/v toward the top singular pair
    (_out, updated) = mpd.apply(
        variables, jnp.asarray(y.transpose(0, 2, 1)), jnp.asarray(y.transpose(0, 2, 1)),
        mutable=["spectral"],
    )
    u0 = variables["spectral"]["disc_s"]["conv_0"]["u"]
    u1 = updated["spectral"]["disc_s"]["conv_0"]["u"]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(u1)), 1.0, rtol=1e-5)
