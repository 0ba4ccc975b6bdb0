"""Waveform-level utilities: feature interpolation, resampling, RMS mixing.

Mirrors utils.py:396-459 of the reference plus the resampling entry points.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sps

import jax
import jax.numpy as jnp


def repeat_expand(content: jax.Array, target_len: int, mode: str = "nearest") -> jax.Array:
    """Resample features [T, C] (or [B, T, C]) along time to target_len.

    Matches ``utils.repeat_expand_2d`` (utils.py:396-424) for modes
    'nearest' / 'left' (both floor-index hold) and 'linear'
    (align_corners=False, like torch F.interpolate).
    """
    src_len = content.shape[-2]
    if mode in ("nearest", "left"):
        idx = jnp.floor(jnp.arange(target_len) * (src_len / target_len)).astype(
            jnp.int32
        )
        return jnp.take(content, idx, axis=-2)
    if mode == "linear":
        scale = src_len / target_len
        x = (jnp.arange(target_len) + 0.5) * scale - 0.5
        x = jnp.clip(x, 0.0, src_len - 1)
        lo = jnp.floor(x).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, src_len - 1)
        w = (x - lo).astype(content.dtype)
        shape = [1] * content.ndim
        shape[-2] = target_len
        w = w.reshape(shape)
        return jnp.take(content, lo, axis=-2) * (1 - w) + jnp.take(
            content, hi, axis=-2
        ) * w
    raise ValueError(f"unknown interpolation mode: {mode}")


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Host-side polyphase resampling (preprocessing / IO boundary).

    Replaces the reference's librosa/torchaudio resample calls
    (e.g. inference/infer_tool.py:273-274). Polyphase kaiser-windowed FIR.
    """
    if orig_sr == target_sr:
        return np.asarray(audio, dtype=np.float32)
    g = np.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    out = sps.resample_poly(np.asarray(audio, dtype=np.float64), up, down, axis=-1)
    return out.astype(np.float32)


def rms_envelope(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """librosa.feature.rms-compatible RMS track (center=True, constant pad)."""
    y = np.asarray(y, dtype=np.float32)
    pad = frame_length // 2
    yp = np.pad(y, (pad, pad), mode="constant")
    n_frames = 1 + (len(yp) - frame_length) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = yp[idx]
    return np.sqrt(np.mean(frames**2, axis=-1))


def _interp_linear_1d(x: np.ndarray, target_len: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on 1-D."""
    src_len = len(x)
    scale = src_len / target_len
    pos = (np.arange(target_len) + 0.5) * scale - 0.5
    pos = np.clip(pos, 0, src_len - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src_len - 1)
    w = pos - lo
    return x[lo] * (1 - w) + x[hi] * w


def change_rms(
    source: np.ndarray,
    source_sr: int,
    output: np.ndarray,
    output_sr: int,
    rate: float,
) -> np.ndarray:
    """Blend the output's loudness envelope toward the source's.

    rate=1 keeps the output envelope; rate=0 imposes the source envelope.
    Matches ``utils.change_rms`` (utils.py:440-459): half-second RMS frames,
    linear interpolation to sample rate, output *= rms1^(1-rate)*rms2^(rate-1).
    """
    rms1 = rms_envelope(source, source_sr // 2 * 2, source_sr // 2)
    rms2 = rms_envelope(output, output_sr // 2 * 2, output_sr // 2)
    rms1 = _interp_linear_1d(rms1, len(output))
    rms2 = np.maximum(_interp_linear_1d(rms2, len(output)), 1e-6)
    return output * (rms1 ** (1 - rate)) * (rms2 ** (rate - 1))


__all__ = ["repeat_expand", "resample", "rms_envelope", "change_rms"]
