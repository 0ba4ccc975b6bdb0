"""Gradio web UI (webUI.py equivalent): model load/unload, conversion tab,
model compression, local model scanning. Gradio isn't bundled in this image;
the app builds lazily and raises a clear error when gradio is absent."""

from __future__ import annotations

import glob
from pathlib import Path

import numpy as np


def scan_local_models(root: str = "logs/44k"):
    """webUI.py:255-265: find (checkpoint, config) pairs under logs/."""
    candidates = []
    for cfg in glob.glob(f"{root}/**/config.json", recursive=True):
        d = Path(cfg).parent
        for ckpt in list(d.glob("ckpt")) + list(d.glob("*.npz")) + list(d.glob("G_*.pth")):
            candidates.append((str(ckpt), cfg))
    return candidates


def build_app():
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed in this environment; install gradio to "
            "use the web UI, or use sovits_tpu.cli.infer / serving.api"
        ) from e

    from ..infer.svc import Svc

    state = {"svc": None}

    def load_model(ckpt, cfg):
        state["svc"] = Svc(ckpt, cfg)
        spks = ", ".join(map(str, state["svc"].spk2id))
        return f"loaded {ckpt} (speakers: {spks})"

    def unload_model():
        state["svc"] = None
        return "unloaded"

    def convert(audio, speaker, tran, f0_predictor, auto_f0, cluster_ratio, slice_db, noise_scale):
        if state["svc"] is None:
            return None, "load a model first"
        sr, wav = audio
        wav = np.asarray(wav, np.float32)
        if wav.dtype.kind == "i":
            wav = wav / 32768.0
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        out = state["svc"].slice_inference(
            wav, sr, speaker, int(tran), slice_db=slice_db,
            cluster_infer_ratio=cluster_ratio, auto_predict_f0=auto_f0,
            noice_scale=noise_scale, f0_predictor=f0_predictor,
        )
        return (state["svc"].target_sample, (np.clip(out, -1, 1) * 32767).astype(np.int16)), "ok"

    with gr.Blocks(title="sovits_tpu") as app:
        gr.Markdown("## sovits_tpu — TPU-native singing voice conversion")
        with gr.Tab("Inference"):
            ckpt = gr.Textbox(label="checkpoint", value="logs/44k/ckpt")
            cfg = gr.Textbox(label="config", value="configs/config.json")
            status = gr.Textbox(label="status")
            with gr.Row():
                gr.Button("Load").click(load_model, [ckpt, cfg], status)
                gr.Button("Unload").click(unload_model, [], status)
            audio = gr.Audio(label="input audio")
            speaker = gr.Textbox(label="speaker", value="0")
            tran = gr.Number(label="transpose (semitones)", value=0)
            f0p = gr.Dropdown(["pm", "dio", "harvest", "yin", "crepe"], value="dio", label="f0 predictor")
            auto_f0 = gr.Checkbox(label="auto predict f0")
            cluster_ratio = gr.Slider(0, 1, 0, label="cluster ratio")
            slice_db = gr.Slider(-80, -20, -40, label="slice db")
            noise_scale = gr.Slider(0, 1, 0.4, label="noise scale")
            out_audio = gr.Audio(label="output")
            gr.Button("Convert").click(
                convert,
                [audio, speaker, tran, f0p, auto_f0, cluster_ratio, slice_db, noise_scale],
                [out_audio, status],
            )
        with gr.Tab("Text-to-Speech"):
            # webUI.py:216-242: edge-TTS text input -> SVC conversion
            from .tts import VOICES_BY_LOCALE

            tts_text = gr.Textbox(label="text")
            tts_lang = gr.Dropdown(
                ["Auto"] + sorted(VOICES_BY_LOCALE), value="Auto", label="language"
            )
            tts_gender = gr.Radio(["Male", "Female"], value="Female", label="gender")
            tts_rate = gr.Slider(-100, 100, 0, label="rate (%)")
            tts_volume = gr.Slider(-100, 100, 0, label="volume (%)")
            tts_speaker = gr.Textbox(label="target speaker", value="0")
            tts_tran = gr.Number(label="transpose (semitones)", value=0)
            tts_out = gr.Audio(label="output")
            tts_status = gr.Textbox(label="status")

            def tts_convert(text, lang, gender, rate, volume, speaker, tran):
                if state["svc"] is None:
                    return None, "load a model first"
                import tempfile

                from scipy.io import wavfile

                from .tts import synthesize

                rate_s = f"+{int(rate)}%" if rate >= 0 else f"{int(rate)}%"
                vol_s = f"+{int(volume)}%" if volume >= 0 else f"{int(volume)}%"
                with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                    synthesize(text, f.name, lang=lang, gender=gender,
                               rate=rate_s, volume=vol_s)
                    sr, wav = wavfile.read(f.name)
                wav = np.asarray(wav, np.float32)
                if wav.dtype.kind == "i":
                    wav = wav / 32768.0
                if wav.ndim > 1:
                    wav = wav.mean(axis=1)
                out = state["svc"].slice_inference(wav, sr, speaker, int(tran))
                return (
                    state["svc"].target_sample,
                    (np.clip(out, -1, 1) * 32767).astype(np.int16),
                ), "ok"

            gr.Button("Synthesize + Convert").click(
                tts_convert,
                [tts_text, tts_lang, tts_gender, tts_rate, tts_volume,
                 tts_speaker, tts_tran],
                [tts_out, tts_status],
            )
        with gr.Tab("Model compression"):
            # webUI.py:244-253: strip optimizer + enc_q for a release model
            comp_in = gr.Textbox(label="checkpoint (ckpt dir / G_*.pth)")
            comp_cfg = gr.Textbox(label="config", value="configs/config.json")
            comp_out = gr.Textbox(label="output .npz", value="logs/44k/release.npz")
            comp_status = gr.Textbox(label="status")

            def do_compress(ckpt, cfg_path, out_path):
                from ..cli.tools import compress

                compress(["-i", ckpt, "-c", cfg_path, "-o", out_path])
                size = Path(out_path).stat().st_size // 1024
                return f"wrote {out_path} ({size} KiB)"

            gr.Button("Compress").click(
                do_compress, [comp_in, comp_cfg, comp_out], [comp_status]
            )
        with gr.Tab("Local models"):
            # webUI.py:255-265: scan logs/ for loadable (ckpt, config) pairs
            scan_root = gr.Textbox(label="scan root", value="logs/44k")
            found = gr.Dataframe(headers=["checkpoint", "config"], label="models")

            def do_scan(root):
                return scan_local_models(root)

            gr.Button("Scan").click(do_scan, [scan_root], [found])
    return app


def main():  # pragma: no cover
    build_app().launch()


if __name__ == "__main__":
    main()
