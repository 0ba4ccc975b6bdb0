"""External-runtime ONNX cross-check (r3 VERDICT next #10).

The emitted ONNX artifacts are verified in-repo only by the numpy
interpreter (sovits_tpu/export/onnx_run.py); a shared misreading of the
spec between emitter and interpreter (attribute encodings, ConvTranspose
pad semantics) would be invisible. This script runs the SAME model bytes
and feeds through `onnxruntime` and the in-repo runtime and compares —
one command to close the gap the moment a real runtime exists. The
reference's analog is the pre-export forward check
(/root/reference/onnx_export.py:93-99).

Usage:
    python tools/onnx_crosscheck.py                 # tiny random-init model
    python tools/onnx_crosscheck.py --full          # full-size config too
    python tools/onnx_crosscheck.py --model m.onnx  # check an existing file
                                                    # (random feeds from its
                                                    # declared input shapes)

Exit code 0 with a SKIP message when onnxruntime is not installed (this
image does not ship it), 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TOL = 2e-4


def _ort_session(model_bytes: bytes):
    import onnxruntime as ort

    opts = ort.SessionOptions()
    opts.log_severity_level = 3
    return ort.InferenceSession(model_bytes, opts, providers=["CPUExecutionProvider"])


def crosscheck(model_bytes: bytes, feeds: dict[str, np.ndarray], label: str) -> bool:
    from sovits_tpu.export.onnx_run import run_model

    ours = run_model(model_bytes, feeds)
    sess = _ort_session(model_bytes)
    ort_outs = sess.run(None, feeds)
    names = [o.name for o in sess.get_outputs()]
    ok = True
    for name, got in zip(names, ort_outs):
        want = ours[name]
        err = float(np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64)).max())
        status = "OK " if err < TOL else "FAIL"
        if err >= TOL:
            ok = False
        print(f"  [{status}] {label}:{name}  max|ort - numpy_rt| = {err:.3e}  (tol {TOL})")
    return ok


def synth_feeds(hps, t: int, seed: int = 1) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(80, 400, (1, t)).astype(np.float32)
    f0[0, :2] = 0.0
    return {
        "c": rng.standard_normal((1, t, hps.model.ssl_dim)).astype(np.float32),
        "f0": f0,
        "mel2ph": np.arange(1, t + 1, dtype=np.int64)[None],
        "uv": (f0 > 0).astype(np.float32),
        "noise": 0.3 * rng.standard_normal(
            (1, hps.model.inter_channels, t)
        ).astype(np.float32),
        "sid": np.asarray([0], np.int64),
    }


def check_synthesizer(full: bool) -> bool:
    import jax
    import jax.numpy as jnp

    from sovits_tpu import config as scfg
    from sovits_tpu.export.onnx_synth import build_synthesizer_onnx
    from sovits_tpu.models import factory

    if full:
        hps, t = scfg.default_config(), 64
        label = "synthesizer-fullsize"
    else:
        hps, t = scfg.default_config(), 13
        hps.data["filter_length"] = 128
        hps.data["hop_length"] = 64
        hps.data["win_length"] = 128
        for k, v in dict(
            ssl_dim=16, gin_channels=8, hidden_channels=32, inter_channels=16,
            filter_channels=48, n_heads=2, n_layers=2, n_speakers=3,
            upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
            upsample_initial_channel=32, resblock_kernel_sizes=[3, 5],
            resblock_dilation_sizes=[[1, 2], [1, 2]],
        ).items():
            hps.model[k] = v
        label = "synthesizer-tiny"
    syn = factory.build_synthesizer(hps, dtype=jnp.float32)
    params = jax.tree.map(
        np.asarray,
        factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=8),
    )
    mb = build_synthesizer_onnx(params, hps, chara_mix=False)
    return crosscheck(mb, synth_feeds(hps, t), label)


def check_file(path: str) -> bool:
    from sovits_tpu.export.onnx_proto import parse_model

    model_bytes = Path(path).read_bytes()
    m = parse_model(model_bytes)
    rng = np.random.default_rng(0)
    feeds = {}
    for name, dtype, shape in m.graph.inputs:
        dims = [d if isinstance(d, int) and d > 0 else 16 for d in shape]
        if dtype == 7:  # int64
            feeds[name] = (
                np.arange(1, int(np.prod(dims)) + 1, dtype=np.int64).reshape(dims)
                if name == "mel2ph"
                else np.zeros(dims, np.int64)
            )
        else:
            feeds[name] = rng.standard_normal(dims).astype(np.float32) * 0.3
    return crosscheck(model_bytes, feeds, Path(path).name)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", help="existing .onnx file to check")
    ap.add_argument("--full", action="store_true",
                    help="also cross-check the full-size synthesizer config")
    args = ap.parse_args(argv)

    try:
        import onnxruntime  # noqa: F401
    except ImportError:
        print("SKIP: onnxruntime is not installed in this environment; "
              "run `pip install onnxruntime` wherever available and re-run.")
        return 0

    import jax

    jax.config.update("jax_platforms", "cpu")
    ok = True
    if args.model:
        ok &= check_file(args.model)
    else:
        ok &= check_synthesizer(full=False)
        if args.full:
            ok &= check_synthesizer(full=True)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
