"""Speech-encoder factory (utils.get_speech_encoder, utils.py:111-153).

Encoders expose ``encode(wav16k: np.ndarray [L]) -> np.ndarray [T, H]`` at
16 kHz / 320-sample hop (50 fps), the SoftVC front-end contract
(vencoder/encoder.py:1-13).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from .convert import from_bshall_hubert, from_fairseq_hubert
from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

CONFIGS = {
    # name -> (config, pad_input, source_format)
    "vec768l12": (Wav2Vec2Config(output_layer=12), False, "fairseq"),
    "vec256l9": (
        Wav2Vec2Config(output_layer=9, final_proj_dim=256),
        False,
        "fairseq",
    ),
    "hubertsoft": (
        Wav2Vec2Config(final_proj_dim=256),
        True,  # bshall pads (400-320)//2 (hubert_model.py:70)
        "bshall",
    ),
    "cnhubertlarge": (
        Wav2Vec2Config(d_model=1024, n_layers=24, n_heads=16, ffn_dim=4096),
        False,
        "fairseq",
    ),
}


class JaxSpeechEncoder:
    def __init__(self, name: str, variables: dict, config: Wav2Vec2Config, pad: bool):
        self.name = name
        self.hidden_dim = config.final_proj_dim or config.d_model
        self.net = Wav2Vec2Encoder(config)
        # keep params as jit *arguments*, not closure constants — baking 95M
        # params into the HLO bloats the executable (and overflows remote
        # compile transports)
        self.variables = jax.tree.map(jnp.asarray, variables)
        self.pad = pad
        self._fn = jax.jit(lambda v, wav: self.net.apply(v, wav))
        self._bucket_cache = {}

    def encode_async(self, wav16k: np.ndarray):
        """Dispatch the encoder and return a zero-arg materializer.

        The jit call is asynchronous: the device computes while the host
        does other work (Svc overlaps the f0 predictor's host DSP with
        it); calling the returned closure blocks and yields the [T, H]
        numpy features."""
        wav = np.asarray(wav16k, dtype=np.float32)
        if self.pad:
            wav = np.pad(wav, (40, 40))
        n_frames = (len(wav) - 400) // 320 + 1
        # bucket to multiples of 1 s to bound recompiles
        bucket = int(np.ceil(len(wav) / 16000)) * 16000
        wav = np.pad(wav, (0, bucket - len(wav)))
        out = self._fn(self.variables, jnp.asarray(wav[None]))
        return lambda: np.asarray(out)[0, :n_frames]

    def encode(self, wav16k: np.ndarray) -> np.ndarray:
        return self.encode_async(wav16k)()


def load_torch_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        ckpt = ckpt["model"]  # fairseq layout
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            k = k.removeprefix("module.")
            out[k] = v.float().numpy()
    return out


def get_speech_encoder(name: str, checkpoint_path: str | None = None, **_):
    """Build an encoder; converts a torch/fairseq checkpoint if given.

    Default checkpoint locations mirror the reference's pretrain/ layout.
    """
    if name.endswith("-onnx"):
        raise NotImplementedError(
            "onnx encoder variants are not supported; use the JAX-native "
            f"equivalent '{name.removesuffix('-onnx')}'"
        )
    if name == "dphubert":
        from .dphubert import load_dphubert_encoder

        checkpoint_path = checkpoint_path or "pretrain/DPHuBERT-sp0.75.pth"
        if not Path(checkpoint_path).exists():
            raise FileNotFoundError(f"DPHuBERT checkpoint not found: {checkpoint_path}")
        return load_dphubert_encoder(checkpoint_path)
    if name == "wavlmbase+":
        from .wavlm import load_wavlm_encoder

        checkpoint_path = checkpoint_path or "pretrain/WavLM-Base+.pt"
        if not Path(checkpoint_path).exists():
            raise FileNotFoundError(f"WavLM checkpoint not found: {checkpoint_path}")
        return load_wavlm_encoder(checkpoint_path)
    if name.startswith("whisper-ppg"):
        from .whisper import load_whisper_encoder

        defaults = {
            "whisper-ppg": "pretrain/medium.pt",
            "whisper-ppg-large": "pretrain/large-v2.pt",
        }
        checkpoint_path = checkpoint_path or defaults.get(name, "pretrain/medium.pt")
        if not Path(checkpoint_path).exists():
            raise FileNotFoundError(
                f"whisper checkpoint not found: {checkpoint_path}"
            )
        return load_whisper_encoder(name, checkpoint_path)
    if name not in CONFIGS:
        raise ValueError(
            f"unknown speech encoder '{name}' (available: "
            f"{sorted(CONFIGS) + ['whisper-ppg', 'whisper-ppg-large', 'wavlmbase+', 'dphubert']})"
        )
    config, pad, fmt = CONFIGS[name]

    if checkpoint_path is None:
        defaults = {
            "vec768l12": "pretrain/checkpoint_best_legacy_500.pt",
            "vec256l9": "pretrain/checkpoint_best_legacy_500.pt",
            "hubertsoft": "pretrain/hubert-soft-0d54a1f4.pt",
            "cnhubertlarge": "pretrain/chinese-hubert-large-fairseq-ckpt.pt",
        }
        checkpoint_path = defaults[name]
    if not Path(checkpoint_path).exists():
        raise FileNotFoundError(
            f"speech-encoder checkpoint not found: {checkpoint_path}; download "
            "the same checkpoint the reference uses and point to it"
        )
    sd = load_torch_state_dict(checkpoint_path)
    if fmt == "bshall":
        params = from_bshall_hubert(sd, config.n_layers, config.n_heads)
    else:
        params = from_fairseq_hubert(
            sd,
            config.output_layer or config.n_layers,
            config.n_heads,
            final_proj=config.final_proj_dim is not None,
        )
    variables = {"params": jax.tree.map(jnp.asarray, params)}
    return JaxSpeechEncoder(name, variables, config, pad)
