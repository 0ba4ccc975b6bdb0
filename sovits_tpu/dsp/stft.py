"""STFT / mel-spectrogram primitives (jittable, TPU-first).

Numerical contract mirrors the reference front-end
(/root/reference/modules/mel_processing.py:40-83):

- reflect-pad the waveform by (n_fft - hop)/2 on each side,
- center=False STFT with a periodic Hann window,
- magnitude = sqrt(re^2 + im^2 + 1e-6),
- mel = log(clamp(fbank @ mag, min=1e-5)).

TPU-first design choices:
- channels-last output [B, T_frames, F] so the mel projection is a single
  MXU matmul,
- framing uses hop-block reshapes + static slices (no gathers) whenever
  win_length is a multiple of hop_length (the 2048/512 default),
- all spectral math runs in float32 regardless of input dtype (matching the
  reference's bf16->fp32 cast at mel_processing.py:56-57).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .mel import hann_window, mel_filterbank


def frame_signal(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Frame [B, L] -> [B, n_frames, frame_length] with n_frames = 1 + (L-frame)//hop.

    Uses the hop-block decomposition when hop divides frame_length: reshape
    the signal into hop-sized blocks and stack k = frame//hop shifted static
    slices. This lowers to pure reshapes/slices (HBM-bandwidth bound, no
    gather) on TPU.
    """
    b, length = y.shape
    n_frames = 1 + (length - frame_length) // hop_length
    if frame_length % hop_length == 0:
        k = frame_length // hop_length
        n_blocks = length // hop_length
        blocks = y[:, : n_blocks * hop_length].reshape(b, n_blocks, hop_length)
        # frame t = blocks[t : t+k]; requires n_blocks >= n_frames + k - 1,
        # which holds by construction of n_frames.
        parts = [blocks[:, i : i + n_frames] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    # General fallback: strided gather.
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(frame_length)[None, :]
    )
    return y[:, idx]


def spectrogram(
    y: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int = 2048,
    center: bool = False,
) -> jax.Array:
    """Linear magnitude spectrogram of [B, L] -> [B, T, 1 + n_fft//2].

    Matches ``spectrogram_torch`` (mel_processing.py:40-64): reflect pad by
    (n_fft - hop)/2, center=False torch.stft, sqrt(power + 1e-6) magnitude.
    """
    assert win_length <= n_fft
    orig_dtype = y.dtype
    y = y.astype(jnp.float32)

    if not center:
        pad = int((n_fft - hop_length) / 2)
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    else:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")

    frames = frame_signal(y, win_length, hop_length)  # [B, T, win]
    window = jnp.asarray(hann_window(win_length))
    frames = frames * window
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        frames = jnp.pad(frames, ((0, 0), (0, 0), (lpad, n_fft - win_length - lpad)))

    if jax.default_backend() == "tpu":
        # TPU has no FFT unit and XLA's generic FFT lowering is the single
        # hottest op of the mel loss (~3 ms/step at batch 6); an explicit
        # rDFT as two fp32 matmuls runs on the MXU instead (<0.3 ms). The
        # phase index is reduced mod n_fft in INTEGER arithmetic first —
        # cos(2*pi*k*f/n) with k*f ~ 2e6 in float32 would lose ~4e-4 rad
        # to argument-reduction error.
        # optimization_barrier: without it XLA constant-folds the 2M-entry
        # cos/sin tables AT COMPILE TIME (minutes of folding per program);
        # behind the barrier they are an on-device VPU fill (~10 us)
        k, f = jax.lax.optimization_barrier((
            jnp.arange(n_fft, dtype=jnp.int32),
            jnp.arange(n_fft // 2 + 1, dtype=jnp.int32),
        ))
        ang = (2.0 * np.pi / n_fft) * (
            (k[:, None] * f[None, :]) % n_fft
        ).astype(jnp.float32)
        pr = jax.lax.Precision.HIGHEST
        re = jnp.matmul(frames, jnp.cos(ang), precision=pr)
        im = -jnp.matmul(frames, jnp.sin(ang), precision=pr)
        mag = jnp.sqrt(re**2 + im**2 + 1e-6)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)
    del orig_dtype  # spectral output stays float32 by design
    return mag


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """log-compress magnitudes (mel_processing.py:8-14)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def dynamic_range_decompression(x: jax.Array) -> jax.Array:
    return jnp.exp(x)


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    n_mels: int,
    sample_rate: int,
    fmin: float,
    fmax: float,
) -> jax.Array:
    """Project linear magnitude [B, T, F] to log-mel [B, T, M].

    Matches ``spec_to_mel_torch`` (mel_processing.py:67-76). The filterbank
    is a host-built constant; the projection is one MXU matmul.
    """
    fbank = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.matmul(spec.astype(jnp.float32), fbank, precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel)


def mel_spectrogram(
    y: jax.Array,
    n_fft: int = 2048,
    n_mels: int = 80,
    sample_rate: int = 44100,
    hop_length: int = 512,
    win_length: int = 2048,
    fmin: float = 0.0,
    fmax: float = 22050.0,
    center: bool = False,
) -> jax.Array:
    """Waveform [B, L] -> log-mel [B, T, M] (mel_processing.py:79-83)."""
    spec = spectrogram(y, n_fft, hop_length, win_length, center)
    return spec_to_mel(spec, n_fft, n_mels, sample_rate, fmin, fmax)


def energy(y: jax.Array, hop_length: int = 512) -> jax.Array:
    """RMS per hop frame — the volume feature (utils.py:560-572).

    audio [B, L] -> [B, L // hop]. Matches Volume_Extractor.extract: square,
    reflect-pad by (hop//2, (hop+1)//2), mean over hop-strided windows, sqrt.
    """
    n_frames = y.shape[-1] // hop_length
    a2 = y.astype(jnp.float32) ** 2
    a2 = jnp.pad(
        a2, ((0, 0), (hop_length // 2, (hop_length + 1) // 2)), mode="reflect"
    )
    # unfold(kernel=hop, stride=hop) == non-overlapping blocks of the padded
    # signal, truncated to n_frames.
    n_blocks = a2.shape[-1] // hop_length
    blocks = a2[:, : n_blocks * hop_length].reshape(y.shape[0], n_blocks, hop_length)
    vol = jnp.sqrt(jnp.mean(blocks[:, :n_frames], axis=-1))
    return vol


__all__ = [
    "frame_signal",
    "spectrogram",
    "spec_to_mel",
    "mel_spectrogram",
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "energy",
    "hann_window",
    "mel_filterbank",
]
