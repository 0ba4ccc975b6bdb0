"""HTTP voice-conversion API (flask_api.py + flask_api_full_song.py parity).

Implemented on the stdlib ThreadingHTTPServer (flask isn't a framework
dependency). Endpoints and form fields match the reference so the VST
plugin / existing clients work unchanged:

- POST /voiceChangeModel   multipart: sample (wav bytes), fPitchChange,
  sampleRate, sSpeakId  -> streaming chunk conversion (RealTimeVC) or
  direct infer, resampled to the DAW rate (flask_api.py:19-60)
- POST /wav2wav            multipart: audio (wav), tran, spk, wav_format
  -> full-song slice inference (flask_api_full_song.py:12-55)
"""

from __future__ import annotations

import io
import json
from email.parser import BytesParser
from email.policy import HTTP
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
from scipy.io import wavfile

from ..dsp.audio import resample
from ..infer.svc import RealTimeVC, Svc


def parse_multipart(headers: dict, body: bytes) -> dict:
    """Minimal multipart/form-data parser (stdlib email machinery)."""
    content_type = headers.get("Content-Type", headers.get("content-type", ""))
    raw = (
        b"Content-Type: " + content_type.encode() + b"\r\nMIME-Version: 1.0\r\n\r\n" + body
    )
    msg = BytesParser(policy=HTTP).parsebytes(raw)
    fields = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name is None:
            continue
        payload = part.get_payload(decode=True)
        fields[name] = payload
    return fields


def wav_bytes_to_array(data: bytes) -> tuple[np.ndarray, int]:
    sr, wav = wavfile.read(io.BytesIO(data))
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32768.0
    elif wav.dtype == np.int32:
        wav = wav.astype(np.float32) / 2147483648.0
    else:
        wav = wav.astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    return wav, sr


def array_to_wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    wavfile.write(buf, sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16))
    return buf.getvalue()


def make_handler(svc: Svc, realtime: RealTimeVC, defaults: dict):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str = "audio/wav"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                fields = parse_multipart(dict(self.headers), body)
                if self.path == "/voiceChangeModel":
                    self._voice_change(fields)
                elif self.path == "/wav2wav":
                    self._wav2wav(fields)
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # pragma: no cover - error path
                self._send(
                    500, json.dumps({"error": str(e)}).encode(), "application/json"
                )

        def _voice_change(self, fields):
            wav, sr = wav_bytes_to_array(fields["sample"])
            pitch = int(float(fields.get("fPitchChange", b"0")))
            daw_sample = int(fields.get("sampleRate", str(sr).encode()))
            speaker = fields.get("sSpeakId", b"0").decode()
            speaker = int(speaker) if speaker.isdigit() else speaker
            if defaults.get("raw_infer", True):
                out, _, _ = svc.infer(
                    speaker, pitch, wav, sr=sr,
                    f0_predictor=defaults.get("f0_predictor", "dio"),
                )
            else:
                out = realtime.process(
                    svc, speaker, pitch, wav, sr,
                    f0_predictor=defaults.get("f0_predictor", "dio"),
                )
            out = resample(np.asarray(out), svc.target_sample, daw_sample)
            self._send(200, array_to_wav_bytes(out, daw_sample))

        def _wav2wav(self, fields):
            wav, sr = wav_bytes_to_array(fields["audio"])
            tran = int(float(fields.get("tran", b"0")))
            speaker = fields.get("spk", b"0").decode()
            speaker = int(speaker) if speaker.isdigit() else speaker
            out = svc.slice_inference(
                wav, sr, speaker, tran,
                slice_db=defaults.get("slice_db", -40),
                f0_predictor=defaults.get("f0_predictor", "dio"),
            )
            self._send(200, array_to_wav_bytes(out, svc.target_sample))

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(svc: Svc, host: str = "0.0.0.0", port: int = 6842, **defaults):
    handler = make_handler(svc, RealTimeVC(), defaults)
    server = ThreadingHTTPServer((host, port), handler)
    print(f"sovits_tpu API listening on {host}:{port}")
    server.serve_forever()


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("-c", "--config_path", default="configs/config.json")
    parser.add_argument("--port", type=int, default=6842)
    parser.add_argument("--f0_predictor", default="dio")
    args = parser.parse_args(argv)
    svc = Svc(args.model_path, args.config_path)
    serve(svc, port=args.port, f0_predictor=args.f0_predictor)


if __name__ == "__main__":
    main()
