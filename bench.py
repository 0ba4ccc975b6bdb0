"""Benchmark harness: RTF for a 10 s 44.1 kHz conversion on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): RTF < 0.05 on a single TPU v5e chip.
vs_baseline = target_rtf / measured_rtf (>1 means beating the target).

Current scope grows with the framework; right now it measures the front-end
mel pipeline + will be replaced by the full SynthesizerTrn infer path.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from sovits_tpu import dsp

    sr = 44100
    seconds = 10.0
    n = int(sr * seconds)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1)

    fn = jax.jit(lambda y: dsp.mel_spectrogram(y))
    fn(wav).block_until_ready()  # compile

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(wav).block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    rtf = dt / seconds
    target = 0.05
    print(
        json.dumps(
            {
                "metric": "mel_frontend_rtf_10s_44k1",
                "value": rtf,
                "unit": "rtf",
                "vs_baseline": target / rtf if rtf > 0 else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
