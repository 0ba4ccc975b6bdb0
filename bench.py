"""Benchmark: RTF for a 10 s 44.1 kHz SVC conversion on one TPU chip.

Runs the flagship synthesis path (full-size SynthesizerTrn-equivalent:
content prior -> reverse flow -> NSF-HiFiGAN at 44.1 kHz), bf16 compute,
batch 1, 862 content frames (10 s at hop 512). Prints ONE JSON line.

Baseline target (BASELINE.md): RTF < 0.05 on one v5e chip.
vs_baseline = target_rtf / measured_rtf (>1.0 beats the target).
RTF harness mirrors the reference's solver RTF (diffusion/solver.py:54-59):
wall_time / (samples / sample_rate).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from sovits_tpu import config as scfg
    from sovits_tpu.models import Synthesizer, factory

    hps = scfg.default_config()
    sr = hps.data.sampling_rate
    hop = hps.data.hop_length
    seconds = 10.0
    t_frames = int(sr * seconds) // hop  # 861

    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    params = factory.init_synthesizer_params(
        syn, jax.random.PRNGKey(0), hps, t_frames=32, batch=1
    )

    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((1, t_frames, hps.model.ssl_dim)), jnp.float32)
    f0 = jnp.asarray(rng.uniform(100, 400, (1, t_frames)), jnp.float32)
    uv = jnp.ones((1, t_frames), jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def infer(c, f0, uv, spk):
        wav, _ = syn.apply(
            {"params": params},
            c,
            f0,
            uv,
            spk,
            sample_noise=False,
            method=Synthesizer.infer,
        )
        return wav

    wav = infer(c, f0, uv, spk)
    wav.block_until_ready()
    n_samples = wav.shape[1]

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        infer(c, f0, uv, spk).block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    rtf = dt / (n_samples / sr)
    target = 0.05
    print(
        json.dumps(
            {
                "metric": "svc_infer_rtf_10s_44k1_bf16",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(target / rtf, 3) if rtf > 0 else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
