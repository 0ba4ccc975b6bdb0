"""Proof the GAN trainer LEARNS, not just compiles (r3 VERDICT next #1).

The reference's implicit quality gate is periodic ``evaluate()`` synthesis
during training (train.py:256-325); every other test in this suite is a
random-init single-step parity check, which cannot distinguish a trainer
that works from one that merely matches one-step numerics. These tests
overfit tiny synthetic data for a few hundred fused steps on the CPU mesh
and assert the actual GAN dynamics:

- G total loss and the mel term decline materially,
- deterministic synthesis from the trained params is non-degenerate
  (finite, non-silent, spectrally concentrated at the driven f0),
- a checkpoint-resumed run CONTINUES the loss trajectory instead of
  restarting it.

The bench-embedded twin (bench.py bench_learning) runs the same protocol
on real TPU hardware each round.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.tiny import make_synthetic_dataset, tiny_hps

from sovits_tpu import train as strain
from sovits_tpu.dsp import stft as dsp_stft
from sovits_tpu.train import trainer as trainer_mod
from sovits_tpu.models import Synthesizer, factory

STEPS = 300


def _sine_batch(hps, b=8, frames=64, seed=11):
    """One fixed overfit batch: pure sine clips, one frequency per item."""
    rng = np.random.default_rng(seed)
    sr, hop = hps.data.sampling_rate, hps.data.hop_length
    n = frames * hop
    t = np.arange(n) / sr
    wavs, f0s = [], []
    for i in range(b):
        freq = 150.0 + 22.0 * i
        wavs.append((0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32))
        f0s.append(np.full(frames, freq, np.float32))
    wav = np.stack(wavs)
    spec = np.stack(
        [
            np.asarray(
                dsp_stft.spectrogram(
                    jnp.asarray(w[None]), hps.data.filter_length, hop,
                    hps.data.win_length,
                )[0]
            )
            for w in wavs
        ]
    )
    return {
        "c": jnp.asarray(
            rng.standard_normal((b, frames, hps.model.ssl_dim)), jnp.float32
        ),
        "f0": jnp.asarray(np.stack(f0s)),
        "uv": jnp.ones((b, frames), jnp.float32),
        "spec": jnp.asarray(spec),
        "wav": jnp.asarray(wav[..., None]),
        "spk": jnp.asarray(np.arange(b) % hps.model.n_speakers, jnp.int32),
        "lengths": jnp.full((b,), frames, jnp.int32),
        "volume": jnp.asarray(np.abs(wav).reshape(b, frames, hop).mean(-1)),
    }


@pytest.mark.slow
def test_gan_overfits_tiny_batch():
    """A few hundred fused steps on one fixed batch: losses decline, eval
    synthesis is non-degenerate and materially closer to ground truth."""
    hps = tiny_hps(**{"train.learning_rate": 8e-4, "model.disc_tiny": True})
    batch = _sine_batch(hps)

    syn = factory.build_synthesizer(hps)
    disc = factory.build_discriminator(hps)
    g_params = factory.init_synthesizer_params(
        syn, jax.random.PRNGKey(0), hps, t_frames=16
    )
    d_params = factory.init_discriminator_params(
        disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
    )
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    state = strain.create_train_state(g_params, d_params, g_tx, d_tx)
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)

    mel_kw = dict(
        n_fft=hps.data.filter_length, n_mels=hps.data.n_mel_channels,
        sample_rate=hps.data.sampling_rate, hop_length=hps.data.hop_length,
        win_length=hps.data.win_length, fmin=hps.data.mel_fmin,
        fmax=hps.data.mel_fmax,
    )

    def eval_synth(params):
        # all 8 items: the prior-path eval is noisy under GAN dynamics;
        # averaging over the full batch keeps the threshold robust
        wav_hat, _ = syn.apply(
            {"params": params}, batch["c"], batch["f0"],
            batch["uv"], batch["spk"], vol=batch["volume"],
            sample_noise=False, method=Synthesizer.infer,
        )
        gt = dsp_stft.mel_spectrogram(batch["wav"][:, :, 0], **mel_kw)
        got = dsp_stft.mel_spectrogram(wav_hat[..., 0], **mel_kw)
        tm = min(gt.shape[-1], got.shape[-1])
        return wav_hat, jnp.mean(jnp.abs(gt[..., :tm] - got[..., :tm]))

    @jax.jit
    def run(state):
        def body(st, i):
            st, metrics = raw_step(
                st, batch, jax.random.fold_in(jax.random.key(3, impl="rbg"), i)
            )
            return st, (
                metrics["loss/g/total"],
                metrics["loss/g/mel"],
                metrics["loss/d/total"],
            )

        st, traces = jax.lax.scan(body, state, jnp.arange(STEPS))
        return st, traces

    _, mel0 = jax.jit(eval_synth)(g_params)
    state, (g_tot, g_mel, d_tot) = run(state)
    wav_hat, mel1 = jax.jit(eval_synth)(state.g_params)
    wav_hat = np.asarray(wav_hat, np.float32)
    g_tot, g_mel, d_tot = map(np.asarray, (g_tot, g_mel, d_tot))

    assert np.isfinite(g_tot).all() and np.isfinite(d_tot).all()
    k = STEPS // 12
    # material decline in both the total and the dominant mel term
    assert g_mel[-k:].mean() < 0.7 * g_mel[:k].mean(), (
        g_mel[:k].mean(), g_mel[-k:].mean()
    )
    assert g_tot[-k:].mean() < 0.8 * g_tot[:k].mean(), (
        g_tot[:k].mean(), g_tot[-k:].mean()
    )
    # non-degenerate synthesis
    assert np.isfinite(wav_hat).all()
    assert np.abs(wav_hat).max() > 1e-3, "trained generator synthesizes silence"
    assert np.abs(wav_hat).max() < 10.0
    # eval synthesis materially closer to ground truth than at init
    assert float(mel1) < 0.7 * float(mel0), (float(mel0), float(mel1))

    # spectrally sane: tonal output, not broadband noise. Spectral flatness
    # (geometric/arithmetic mean of the power spectrum) is ~1 for white
    # noise and near 0 for harmonic signals; 300 steps in, the exact pitch
    # may still wander a bin or two, but the output must already be tonal.
    w0 = wav_hat[0, :, 0] - wav_hat[0, :, 0].mean()  # ignore DC bias
    power = np.abs(np.fft.rfft(w0 * np.hanning(len(w0)))) ** 2 + 1e-20
    flatness = np.exp(np.mean(np.log(power))) / power.mean()
    assert flatness < 0.1, flatness


@pytest.mark.slow
def test_learning_resume_continues_trajectory(tmp_path):
    """Checkpoint-resumed training continues the loss decline instead of
    restarting it (train.py:93-105 resume semantics under real dynamics)."""
    hps = tiny_hps(**{
        "train.learning_rate": 8e-4,
        "model.disc_tiny": True,
        "train.log_interval": 1,
        "train.eval_interval": 10_000,  # only the max_steps save fires
        "train.epochs": 10_000,
    })
    make_synthetic_dataset(tmp_path / "data", hps, n_speakers=2, n_per_spk=3)
    model_dir = tmp_path / "model"

    first, second = 120, 60
    state1 = trainer_mod.train(hps, model_dir, max_steps=first)
    assert int(state1.step) == first
    state2 = trainer_mod.train(hps, model_dir, max_steps=first + second)
    assert int(state2.step) == first + second

    recs = [
        json.loads(line)
        for line in (model_dir / "metrics.jsonl").read_text().splitlines()
    ]
    mel = {r["step"]: r["loss/g/mel"] for r in recs if "loss/g/mel" in r}
    assert len(mel) == first + second
    w = 20
    head = np.mean([mel[s] for s in range(1, 1 + w)])
    pre = np.mean([mel[s] for s in range(first - w + 1, first + 1)])
    post = np.mean([mel[s] for s in range(first + 1, first + 1 + w)])
    tail = np.mean([mel[s] for s in range(first + second - w + 1, first + second + 1)])
    # learned something in run 1, and run 2 picks up where it left off:
    # the first post-resume window sits at the pre-resume level (no jump
    # back toward init) and the trajectory keeps improving end to end.
    assert pre < 0.85 * head, (head, pre)
    assert post < pre * 1.15 + 1e-6, (pre, post)
    assert tail <= pre * 1.05 + 1e-6, (pre, tail)
