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
    n_samples = wav.shape[1]

    # Headline: pure device time per clip. N inferences run inside ONE
    # device-side scan, so host<->device (tunnel) latency is paid once and
    # amortized away; inputs are perturbed per iteration to defeat CSE.
    iters = 20

    def body(carry, i):
        w, _ = syn.apply(
            {"params": params},
            c + i * 1e-6,
            f0,
            uv,
            spk,
            sample_noise=False,
            method=Synthesizer.infer,
        )
        return carry + w.sum(), None

    loop = jax.jit(
        lambda: jax.lax.scan(
            body, jnp.zeros((), wav.dtype), jnp.arange(iters, dtype=jnp.float32)
        )[0]
    )
    np.asarray(loop())  # compile + warm
    t0 = time.perf_counter()
    np.asarray(loop())
    dt = (time.perf_counter() - t0) / iters

    # secondary: naive per-call wall time incl. host round trip
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(infer(c, f0, uv, spk))
    per_call = (time.perf_counter() - t0) / 5

    rtf = dt / (n_samples / sr)
    target = 0.05
    result = {
        "metric": "svc_infer_rtf_10s_44k1_bf16",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(target / rtf, 3) if rtf > 0 else 0.0,
    }
    # emit the headline immediately; the train-rate detail below compiles a
    # large program and must not delay (or be able to fail) the metric
    print(json.dumps(result), flush=True)

    try:
        details = {
            "infer_rtf_device": rtf,
            "infer_rtf_with_host_roundtrip": per_call / (n_samples / sr),
            "train_steps_per_sec": bench_train_step(hps),
        }
        with open("bench_details.json", "w") as f:
            json.dump(details, f, indent=2)
    except Exception as e:  # keep the headline metric robust
        with open("bench_details.json", "w") as f:
            json.dump({"infer_rtf_device": rtf, "train_bench_error": str(e)}, f)


def bench_train_step(hps, iters: int = 10) -> float:
    """Full-size fused GAN train step rate on one chip (bf16 compute),
    batch 6 x 512 frames (max_speclen, config_template.json:23). Steps run
    inside one device-side scan so tunnel latency doesn't distort the rate."""
    from sovits_tpu import train as strain
    from sovits_tpu.models import factory
    from sovits_tpu.parallel import make_mesh, replicate_tree, shard_batch

    hps.data["pad_to_frames"] = 512
    hps.train["batch_size"] = 6
    mesh = make_mesh(n_data=1, n_model=1)

    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    disc = factory.build_discriminator(hps, dtype=jnp.bfloat16)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
        d_params = factory.init_discriminator_params(
            disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
        )
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    state = replicate_tree(
        strain.create_train_state(g_params, d_params, g_tx, d_tx), mesh
    )
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)

    rng = np.random.default_rng(0)
    b, t, hop = 6, 512, hps.data.hop_length
    batch = shard_batch(
        {
            "c": jnp.asarray(rng.standard_normal((b, t, hps.model.ssl_dim)), jnp.float32),
            "f0": jnp.asarray(rng.uniform(80, 400, (b, t)), jnp.float32),
            "uv": jnp.ones((b, t), jnp.float32),
            "spec": jnp.asarray(
                np.abs(rng.standard_normal((b, t, hps.data.filter_length // 2 + 1))),
                jnp.float32,
            ),
            "wav": jnp.asarray(rng.standard_normal((b, t * hop, 1)) * 0.1, jnp.float32),
            "spk": jnp.zeros((b,), jnp.int32),
            "lengths": jnp.full((b,), t, jnp.int32),
            "volume": jnp.abs(jnp.asarray(rng.standard_normal((b, t)), jnp.float32)) * 0.05,
        },
        mesh,
    )
    # device-side loop: N steps per host round trip (tunnel-latency immune)
    def loop(state):
        def body(st, i):
            st, metrics = raw_step(st, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return st, metrics["loss/g/total"]
        st, losses = jax.lax.scan(body, state, jnp.arange(iters))
        return st, losses.sum()

    loop_jit = jax.jit(loop, donate_argnums=(0,))
    state, warm = loop_jit(state)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = loop_jit(state)
    np.asarray(out)
    return iters / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
