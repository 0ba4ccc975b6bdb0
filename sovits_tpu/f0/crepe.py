"""CREPE pitch estimation: the torchcrepe CNN ported to flax.

The reference uses torchcrepe ("full" capacity) with masked median/mean
smoothing and a periodicity threshold (modules/F0Predictor/crepe.py:255-340).
This is the same published architecture in JAX; weights convert 1:1 from a
torchcrepe checkpoint via ``convert_crepe_state_dict``. Salience decoding is
the weighted-average-cents decode (crepe.py "argmax local average" path).

CREPE operates on 1024-sample frames at 16 kHz; input at other rates is
resampled host-side.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dsp.audio import resample
from .base import F0Predictor

CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191
PITCH_BINS = 360
SAMPLE_RATE = 16000
WINDOW_SIZE = 1024


class CrepeNet(nn.Module):
    """torchcrepe 'full' topology; 'tiny' scales channels by 1/8."""

    capacity: str = "full"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: jax.Array) -> jax.Array:
        # frames: [B, 1024] normalized
        mult = 1 if self.capacity == "full" else 8
        channels = [c // mult for c in (1024, 128, 128, 128, 256, 512)]
        widths = (512, 64, 64, 64, 64, 64)
        strides = (4, 1, 1, 1, 1, 1)

        x = frames[:, :, None]  # [B, 1024, 1]
        for i, (ch, kw, st) in enumerate(zip(channels, widths, strides)):
            # torchcrepe pads layer 1 with (254, 254) and others (31, 32)
            pad = (254, 254) if i == 0 else (31, 32)
            x = jnp.pad(x, ((0, 0), pad, (0, 0)))
            x = nn.Conv(
                ch,
                kernel_size=(kw,),
                strides=(st,),
                padding="VALID",
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
            x = jnp.maximum(x, 0.0)
            x = nn.BatchNorm(
                use_running_average=True,
                epsilon=1e-5,
                momentum=0.9,
                dtype=self.dtype,
                name=f"bn{i + 1}",
            )(x)
            # max pool (2, 1)
            t = x.shape[1] - (x.shape[1] % 2)
            x = x[:, :t].reshape(x.shape[0], t // 2, 2, x.shape[2]).max(axis=2)
        x = x.reshape(x.shape[0], -1)  # [B, 2048] for full
        x = nn.Dense(PITCH_BINS, dtype=self.dtype, name="classifier")(x)
        return jax.nn.sigmoid(x)


def convert_crepe_state_dict(sd: dict) -> dict:
    """torchcrepe state_dict (numpy values) -> CrepeNet params/batch_stats."""
    params, stats = {}, {}
    for i in range(1, 7):
        w = sd[f"conv{i}.weight"]  # (out, in, kh, kw=1)
        params[f"conv{i}"] = {
            "kernel": np.transpose(w[..., 0], (2, 1, 0)),
            "bias": sd[f"conv{i}.bias"],
        }
        params[f"bn{i}"] = {
            "scale": sd[f"conv{i}_BN.weight"],
            "bias": sd[f"conv{i}_BN.bias"],
        }
        stats[f"bn{i}"] = {
            "mean": sd[f"conv{i}_BN.running_mean"],
            "var": sd[f"conv{i}_BN.running_var"],
        }
    params["classifier"] = {
        "kernel": np.transpose(sd["classifier.weight"], (1, 0)),
        "bias": sd["classifier.bias"],
    }
    return {"params": params, "batch_stats": stats}


def decode_salience(salience: np.ndarray, threshold: float = 0.05):
    """Weighted-average-cents decode around the argmax bin; returns (f0, per).

    salience: [T, 360]. periodicity = max salience per frame.
    """
    t = salience.shape[0]
    center = salience.argmax(axis=1)
    periodicity = salience[np.arange(t), center]
    lo = np.maximum(center - 4, 0)
    f0 = np.zeros(t)
    for i in range(t):
        s = slice(lo[i], min(lo[i] + 9, PITCH_BINS))
        w = salience[i, s]
        bins = np.arange(s.start, s.stop)
        cents = CENTS_OFFSET + CENTS_PER_BIN * float((w * bins).sum() / (w.sum() + 1e-12))
        f0[i] = 10.0 * 2.0 ** (cents / 1200.0)
    f0[periodicity < threshold] = 0.0
    return f0, periodicity


class CrepeF0Predictor(F0Predictor):
    """CREPE-based predictor; needs converted torchcrepe weights."""

    name = "crepe"

    def __init__(self, *args, variant: str = "crepe", weights: dict | None = None,
                 threshold: float = 0.05, capacity: str = "full", **kwargs):
        super().__init__(*args, **kwargs)
        if variant != "crepe":
            raise NotImplementedError(
                f"f0 predictor '{variant}' (NN-based) requires its JAX port + "
                "converted weights; crepe is implemented — pass weights="
                "convert_crepe_state_dict(torch.load('full.pth'))"
            )
        if weights is None:
            raise FileNotFoundError(
                "CREPE weights not provided; convert a torchcrepe checkpoint "
                "with sovits_tpu.f0.crepe.convert_crepe_state_dict"
            )
        self.threshold = threshold
        self.net = CrepeNet(capacity=capacity)
        self.variables = jax.tree.map(jnp.asarray, weights)
        self._forward = jax.jit(lambda v, frames: self.net.apply(v, frames))

    def raw_f0(self, wav: np.ndarray, p_len: int) -> np.ndarray:
        wav16 = resample(np.asarray(wav, np.float32), self.sampling_rate, SAMPLE_RATE)
        hop16 = int(round(self.hop_length * SAMPLE_RATE / self.sampling_rate))
        half = WINDOW_SIZE // 2
        xp = np.pad(wav16, (half, half + WINDOW_SIZE))
        starts = np.arange(p_len) * hop16
        idx = starts[:, None] + np.arange(WINDOW_SIZE)[None, :]
        idx = np.minimum(idx, len(xp) - 1)
        frames = xp[idx]
        frames = frames - frames.mean(axis=1, keepdims=True)
        frames = frames / (frames.std(axis=1, keepdims=True) + 1e-10)
        salience = np.asarray(self._forward(self.variables, jnp.asarray(frames)))
        f0, _ = decode_salience(salience, self.threshold)
        return f0
