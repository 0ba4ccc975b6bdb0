"""Model export (the reference's onnx_export story, TPU-native).

Where the reference traces SynthesizerTrn to ONNX for MoeSS
(onnx_export.py:11-137), the portable artifact here is a serialized
StableHLO program via ``jax.export``: the jitted infer graph with static
shapes, loadable from any JAX process (and convertible to TF/ONNX via
standard StableHLO tooling). Also writes the MoeSS-style sidecar json with
speaker metadata (onnx_export.py:100-137 analog).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def export_synthesizer(model_path: str, config_path: str, out_path: str,
                       t_frames: int = 512) -> None:
    from jax import export as jexport

    from .. import config as scfg
    from ..infer.svc import Svc
    from ..models import Synthesizer

    svc = Svc(model_path, config_path)
    hps = svc.hps

    def fn(c, f0, uv, spk, noise):
        wav, _ = svc.model.apply(
            {"params": svc.params},
            c,
            f0,
            uv,
            spk,
            sample_noise=False,
            method=Synthesizer.infer,
        )
        del noise
        return wav

    args = (
        jnp.zeros((1, t_frames, hps.model.ssl_dim), jnp.float32),
        jnp.zeros((1, t_frames), jnp.float32),
        jnp.zeros((1, t_frames), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, t_frames), jnp.float32),
    )
    exported = jexport.export(jax.jit(fn))(*args)
    data = exported.serialize()
    Path(out_path).write_bytes(data)

    meta = {
        "Folder": Path(out_path).stem,
        "Name": Path(out_path).stem,
        "Type": "SoVits",
        "Rate": hps.data.sampling_rate,
        "Hop": hps.data.hop_length,
        "Hubert": hps.model.speech_encoder,
        "SoVits4": True,
        "Characters": list(svc.spk2id.keys()),
        "t_frames": t_frames,
    }
    Path(out_path).with_suffix(".json").write_text(json.dumps(meta, indent=2))
    print(f"wrote {out_path} ({len(data) / 1e6:.1f} MB) + sidecar json")


def load_exported(path: str):
    """Deserialize an exported program; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call


def main(argv=None):
    parser = argparse.ArgumentParser(description="export the synthesizer (StableHLO)")
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("-c", "--config_path", default="configs/config.json")
    parser.add_argument("-o", "--output", default="model.stablehlo")
    parser.add_argument("--t-frames", type=int, default=512)
    args = parser.parse_args(argv)
    export_synthesizer(args.model_path, args.config_path, args.output, args.t_frames)


if __name__ == "__main__":
    main()
