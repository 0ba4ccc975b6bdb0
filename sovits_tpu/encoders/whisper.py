"""Whisper-PPG speech encoder: the Whisper audio encoder in flax.

Equivalent of vencoder/WhisperPPG.py + the vendored openai-whisper encoder
(vencoder/whisper/model.py:46-153, audio.py:12-124): 30 s pad-or-trim,
whisper log-mel (N_FFT 400, hop 160, center=True, power mel, log10 with
dynamic floor), two GELU convs (stride 2), sinusoidal positions, pre-LN
transformer, final LayerNorm; PPG = encoder output trimmed to len(wav)//320
frames. 'whisper-ppg' = medium (1024d x 24), 'whisper-ppg-large' =
large-v2 (1280d x 32).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dsp.mel import hann_window, mel_filterbank

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_SAMPLES = 30 * SAMPLE_RATE
N_FRAMES = N_SAMPLES // HOP


@dataclasses.dataclass(frozen=True)
class WhisperDims:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 1024
    n_audio_head: int = 16
    n_audio_layer: int = 24


WHISPER_CONFIGS = {
    "whisper-ppg": WhisperDims(),  # medium
    "whisper-ppg-large": WhisperDims(n_audio_state=1280, n_audio_head=20, n_audio_layer=32),
    "whisper-ppg-small": WhisperDims(n_audio_state=768, n_audio_head=12, n_audio_layer=12),
}


def log_mel_spectrogram(audio: jax.Array) -> jax.Array:
    """whisper audio.py:91-124: [B, N_SAMPLES] -> [B, 3000, 80]."""
    audio = audio.astype(jnp.float32)
    # torch.stft center=True reflect-pads by n_fft//2
    y = jnp.pad(audio, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    n_frames = 1 + (y.shape[-1] - N_FFT) // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = y[:, idx] * jnp.asarray(hann_window(N_FFT))
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
    power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)[:, :-1, :]  # drop last frame
    fbank = jnp.asarray(mel_filterbank(SAMPLE_RATE, N_FFT, 80))
    mel = jnp.matmul(power, fbank, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


class WhisperAttention(nn.Module):
    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.n_state
        head = d // self.n_head
        scale = head**-0.25
        q = nn.Dense(d, dtype=self.dtype, name="query")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="key")(x)
        v = nn.Dense(d, dtype=self.dtype, name="value")(x)
        b, t, _ = x.shape
        q = q.reshape(b, t, self.n_head, head).transpose(0, 2, 1, 3) * scale
        k = k.reshape(b, t, self.n_head, head).transpose(0, 2, 1, 3) * scale
        v = v.reshape(b, t, self.n_head, head).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(
            jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", w, v).transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class WhisperEncoderBlock(nn.Module):
    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="attn_ln")(x)
        x = x + WhisperAttention(self.n_state, self.n_head, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_ln")(x)
        h = nn.Dense(self.n_state * 4, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.n_state, dtype=self.dtype, name="fc2")(h)
        return x + h


class WhisperAudioEncoder(nn.Module):
    dims: WhisperDims
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel [B, T, n_mels] -> [B, T//2, n_state]."""
        d = self.dims
        x = nn.Conv(d.n_audio_state, (3,), padding=1, dtype=self.dtype, name="conv1")(mel)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(
            d.n_audio_state, (3,), strides=(2,), padding=1, dtype=self.dtype, name="conv2"
        )(x)
        x = jax.nn.gelu(x, approximate=False)
        pos = jnp.asarray(sinusoids(d.n_audio_ctx, d.n_audio_state))
        x = x + pos[: x.shape[1]]
        for i in range(d.n_audio_layer):
            x = WhisperEncoderBlock(
                d.n_audio_state, d.n_audio_head, dtype=self.dtype, name=f"block_{i}"
            )(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)


def convert_whisper_encoder(sd: dict, n_layers: int) -> dict:
    """openai-whisper checkpoint 'model_state_dict' -> WhisperAudioEncoder params.

    Keys live under 'encoder.' (conv1, conv2, blocks.N.{attn.*, mlp.*}, ln_post).
    """

    def dense(prefix, bias=True):
        out = {"kernel": np.transpose(sd[prefix + ".weight"], (1, 0))}
        if bias:
            out["bias"] = sd[prefix + ".bias"]
        return out

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def conv(prefix):
        return {
            "kernel": np.transpose(sd[prefix + ".weight"], (2, 1, 0)),
            "bias": sd[prefix + ".bias"],
        }

    p = {
        "conv1": conv("encoder.conv1"),
        "conv2": conv("encoder.conv2"),
        "ln_post": ln("encoder.ln_post"),
    }
    for i in range(n_layers):
        pre = f"encoder.blocks.{i}"
        p[f"block_{i}"] = {
            "attn": {
                "query": dense(pre + ".attn.query"),
                "key": dense(pre + ".attn.key", bias=False),
                "value": dense(pre + ".attn.value"),
                "out": dense(pre + ".attn.out"),
            },
            "attn_ln": ln(pre + ".attn_ln"),
            "mlp_ln": ln(pre + ".mlp_ln"),
            "fc1": dense(pre + ".mlp.0"),
            "fc2": dense(pre + ".mlp.2"),
        }
    return p


class WhisperPPGEncoder:
    """SpeechEncoder-protocol wrapper (vencoder/WhisperPPG.py:22-31)."""

    def __init__(self, name: str, variables: dict, dims: WhisperDims):
        self.name = name
        self.hidden_dim = dims.n_audio_state
        self.net = WhisperAudioEncoder(dims)
        self.variables = variables
        self._fn = jax.jit(lambda v, mel: self.net.apply(v, mel))

    def encode(self, wav16k: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav16k, np.float32)
        ppg_len = len(wav) // 320
        if len(wav) > N_SAMPLES:
            wav = wav[:N_SAMPLES]
        else:
            wav = np.pad(wav, (0, N_SAMPLES - len(wav)))
        mel = log_mel_spectrogram(jnp.asarray(wav[None]))
        ppg = np.asarray(self._fn(self.variables, mel))[0]
        return ppg[:ppg_len]


def load_whisper_encoder(name: str, checkpoint_path: str) -> WhisperPPGEncoder:
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    dims_dict = ckpt["dims"]
    dims = WhisperDims(
        n_mels=dims_dict["n_mels"],
        n_audio_ctx=dims_dict["n_audio_ctx"],
        n_audio_state=dims_dict["n_audio_state"],
        n_audio_head=dims_dict["n_audio_head"],
        n_audio_layer=dims_dict["n_audio_layer"],
    )
    sd = {
        k: v.float().numpy()
        for k, v in ckpt["model_state_dict"].items()
        if k.startswith("encoder.")
    }
    params = convert_whisper_encoder(sd, dims.n_audio_layer)
    return WhisperPPGEncoder(name, {"params": jax.tree.map(jnp.asarray, params)}, dims)
