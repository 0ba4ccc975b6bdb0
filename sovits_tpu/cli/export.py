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


def export_synthesizer_onnx(model_path: str, config_path: str, out_path: str) -> None:
    """Emit a real ONNX artifact with the MoeSS io contract (onnx_export.py
    analog; self-contained emission, see sovits_tpu/export/onnx_synth.py)
    plus the MoeVSConf sidecar, and verify it loads and runs via the in-repo
    numpy ONNX runtime before writing."""
    import numpy as np

    from ..export.onnx_run import run_model
    from ..export.onnx_synth import build_synthesizer_onnx, moevs_config
    from ..infer.svc import Svc

    svc = Svc(model_path, config_path)
    hps = svc.hps
    chara_mix = len(svc.spk2id) > 1
    data = build_synthesizer_onnx(
        jax.tree.map(np.asarray, svc.params), hps, chara_mix=chara_mix
    )

    # load-and-run smoke before shipping the bytes
    t = 16
    feeds = {
        "c": np.zeros((1, t, hps.model.ssl_dim), np.float32),
        "f0": np.full((1, t), 220.0, np.float32),
        "mel2ph": np.arange(1, t + 1, dtype=np.int64)[None],
        "uv": np.ones((1, t), np.float32),
        "noise": np.zeros((1, hps.model.inter_channels, t), np.float32),
        "sid": (
            np.full((t, hps.model.n_speakers), 1.0 / max(len(svc.spk2id), 1), np.float32)
            if chara_mix
            else np.zeros((1,), np.int64)
        ),
    }
    if getattr(hps.model, "vol_embedding", False):
        feeds["vol"] = np.zeros((1, t), np.float32)
    audio = run_model(data, feeds)["audio"]
    assert np.isfinite(audio).all() and audio.shape[-1] > 0

    Path(out_path).write_bytes(data)
    meta = moevs_config(hps, Path(out_path).stem, chara_mix)
    meta["Characters"] = list(svc.spk2id.keys())
    Path(out_path).with_suffix(".json").write_text(json.dumps(meta, indent=2))
    print(f"wrote {out_path} ({len(data) / 1e6:.1f} MB) + MoeVS sidecar json")


def export_diffusion_onnx(model_path: str, config_path: str, out_prefix: str) -> None:
    """Emit the four MoeSS diffusion artifacts
    ({prefix}_encoder/_denoise/_pred/_after.onnx — the reference
    diffusion/onnx_export.py:135-235 bundle), each verified load-and-run
    through the in-repo numpy ONNX runtime before writing."""
    from ..export.onnx_diffusion import build_diffusion_onnx
    from ..export.onnx_run import run_model
    from ..train.diffusion import (
        build_unit2mel,
        load_diffusion_config,
        load_torch_unit2mel,
    )

    args = load_diffusion_config(config_path)
    if model_path.endswith(".npz"):  # train_diffusion's release artifact
        from .tools import unflatten_params

        params = unflatten_params(dict(np.load(model_path)))
        # mel dims come from the vocoder normally; recover from the ckpt
        mel_dims = int(params["denoiser"]["input_projection"]["kernel"].shape[1])
        model = build_unit2mel(args, mel_dims)
    else:  # reference torch checkpoint
        model, variables = load_torch_unit2mel(model_path, args)
        params = jax.tree.map(np.asarray, variables["params"])
    graphs = build_diffusion_onnx(params, model)

    # load-and-run smoke on every artifact before shipping bytes
    t = 8
    feeds_enc = {
        "hubert": np.zeros((1, t, model.input_channel), np.float32),
        "mel2ph": np.arange(1, t + 1, dtype=np.int64)[None],
        "f0": np.full((1, t), 220.0, np.float32),
        "volume": np.zeros((1, t), np.float32),
    }
    if (model.n_spk or 1) > 1:
        feeds_enc["spk_mix"] = np.full(
            (t, model.n_spk), 1.0 / model.n_spk, np.float32
        )
    cond = run_model(graphs["encoder"], feeds_enc)["mel_pred"]
    noise = np.zeros((1, 1, model.out_dims, t), np.float32)
    tt = np.asarray([1], np.int64)
    np_pred = run_model(
        graphs["denoise"], {"noise": noise, "time": tt, "condition": cond}
    )["noise_pred"]
    x = run_model(
        graphs["pred"],
        {"noise": noise, "noise_pred": np_pred, "time": tt, "time_prev": tt},
    )["noise_pred_o"]
    mel = run_model(graphs["after"], {"x": x})["mel_out"]
    assert np.isfinite(mel).all()

    for suffix, data in graphs.items():
        out = f"{out_prefix}_{suffix}.onnx"
        Path(out).write_bytes(data)
        print(f"wrote {out} ({len(data) / 1e6:.1f} MB)")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="export the synthesizer or diffusion model (StableHLO or ONNX)"
    )
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("-c", "--config_path", default="configs/config.json")
    parser.add_argument("-o", "--output", default="model.stablehlo")
    parser.add_argument("--t-frames", type=int, default=512)
    parser.add_argument(
        "--onnx", action="store_true",
        help="emit a MoeSS-contract ONNX model instead of StableHLO",
    )
    parser.add_argument(
        "--diffusion", action="store_true",
        help="export the shallow-diffusion model (-m diffusion ckpt, -c "
        "diffusion.yaml); with --onnx, emits the four MoeSS artifacts "
        "{output}_encoder/_denoise/_pred/_after.onnx",
    )
    args = parser.parse_args(argv)
    if args.diffusion:
        if not args.onnx:
            raise SystemExit("--diffusion currently requires --onnx")
        prefix = args.output
        for ext in (".onnx", ".stablehlo"):
            if prefix.endswith(ext):
                prefix = prefix[: -len(ext)]
        export_diffusion_onnx(args.model_path, args.config_path, prefix)
    elif args.onnx:
        out = args.output
        if out.endswith(".stablehlo"):
            out = out[: -len(".stablehlo")] + ".onnx"
        export_synthesizer_onnx(args.model_path, args.config_path, out)
    else:
        export_synthesizer(args.model_path, args.config_path, args.output, args.t_frames)


if __name__ == "__main__":
    main()
