"""Per-component timing of the fused GAN train step on the real chip.

Times each piece inside a device-side lax.scan (tunnel-latency immune):
generator forward, discriminator forward, D step (fwd+bwd+opt), G step
(fwd+bwd+opt), mel losses, and the full fused step. Run:
    python tools/profile_train.py
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))


def scan_time(fn, *args, iters=8):
    def loop(*a):
        def body(carry, i):
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            return carry + leaf.sum().astype(jnp.float32), None

        return jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(iters, dtype=jnp.float32)
        )[0]

    jitted = jax.jit(loop)
    np.asarray(jitted(*args))
    t0 = time.perf_counter()
    np.asarray(jitted(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from sovits_tpu import config as scfg
    from sovits_tpu import train as strain
    from sovits_tpu.dsp.sequence import slice_segments
    from sovits_tpu.dsp.stft import mel_spectrogram, spec_to_mel
    from sovits_tpu.models import factory

    hps = scfg.default_config()
    hps.data["pad_to_frames"] = 512
    hps.train["batch_size"] = 6

    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    disc = factory.build_discriminator(hps, dtype=jnp.bfloat16)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
        d_params = factory.init_discriminator_params(
            disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
        )
    g_params = jax.device_put(g_params, jax.devices()[0])
    d_params = jax.device_put(d_params, jax.devices()[0])

    rng = np.random.default_rng(0)
    b, t, hop = 6, 512, hps.data.hop_length
    batch = {
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
    }
    seg_samples = hps.train.segment_size
    seg_frames = seg_samples // hop
    mel_kw = dict(
        n_fft=hps.data.filter_length,
        n_mels=hps.data.n_mel_channels,
        sample_rate=hps.data.sampling_rate,
        fmin=hps.data.mel_fmin,
        fmax=hps.data.mel_fmax,
    )

    step_rng = jax.random.PRNGKey(0)
    rngs = {
        "noise": jax.random.fold_in(step_rng, 0),
        "slice": jax.random.fold_in(step_rng, 1),
        "dropout": jax.random.fold_in(step_rng, 2),
    }

    def gen_fwd(g_params, batch):
        return syn.apply(
            {"params": g_params}, batch["c"], batch["f0"], batch["uv"],
            batch["spec"], batch["spk"], batch["lengths"], vol=batch["volume"],
            deterministic=False, rngs=rngs,
        )

    t_gen = scan_time(lambda p, bt: gen_fwd(p, bt)[0], g_params, batch)
    print(f"generator fwd (train shapes): {t_gen*1e3:8.2f} ms")

    out = jax.jit(gen_fwd)(g_params, batch)
    y_hat, ids_slice = out[0], out[1]
    y_seg = slice_segments(batch["wav"], ids_slice * hop, seg_samples)

    t_disc = scan_time(
        lambda dp, a, b_: jax.tree.leaves(disc.apply({"params": dp}, a, b_))[0],
        d_params, y_seg, y_hat,
    )
    print(f"discriminator fwd (both inputs): {t_disc*1e3:8.2f} ms")

    t_mel = scan_time(
        lambda w: mel_spectrogram(
            w[..., 0], hop_length=hop, win_length=hps.data.win_length, **mel_kw
        ),
        y_hat,
    )
    print(f"mel_spectrogram on y_hat seg:    {t_mel*1e3:8.2f} ms")

    # grad-of-generator-forward alone (G fwd+bwd without D)
    def g_only_loss(g_params):
        y_hat_g, ids, spec_mask, (z, z_p, m_p, logs_p, m_q, logs_q), pl, nl, lf = gen_fwd(
            g_params, batch
        )
        return jnp.mean(jnp.abs(y_hat_g)) + jnp.mean(z_p * z_p)

    t_gen_grad = scan_time(
        lambda p: jax.grad(g_only_loss)(p)["emb_g"]["embedding"], g_params
    )
    print(f"generator fwd+bwd (no D):        {t_gen_grad*1e3:8.2f} ms")

    def d_only_loss(d_params):
        r_logits, f_logits, _, _ = disc.apply({"params": d_params}, y_seg, y_hat)
        return sum(jnp.mean((1 - r) ** 2) + jnp.mean(f**2) for r, f in zip(r_logits, f_logits))

    t_d_grad = scan_time(
        lambda p: jax.tree.leaves(jax.grad(d_only_loss)(p))[0], d_params
    )
    print(f"discriminator fwd+bwd:           {t_d_grad*1e3:8.2f} ms")

    # full fused step
    g_tx = strain.make_optimizer(hps)
    d_tx = strain.make_optimizer(hps)
    state = strain.create_train_state(g_params, d_params, g_tx, d_tx)
    raw_step = strain.make_train_step(syn, disc, g_tx, d_tx, hps, jit_compile=False)

    def loop(state):
        def body(st, i):
            st, metrics = raw_step(st, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return st, metrics["loss/g/total"]

        st, losses = jax.lax.scan(body, state, jnp.arange(8))
        return st, losses.sum()

    loop_jit = jax.jit(loop, donate_argnums=(0,))
    state, warm = loop_jit(state)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, o = loop_jit(state)
    np.asarray(o)
    t_step = (time.perf_counter() - t0) / 8
    print(f"full fused train step:           {t_step*1e3:8.2f} ms  ({1/t_step:.1f} steps/s)")


if __name__ == "__main__":
    main()
