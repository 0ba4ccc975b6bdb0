"""Bisect the G backward by loss term (tunnel-immune, see
profile_train_bisect.py for the methodology).

Each variant: grad of ONE loss term wrt g_params (or d_params), applied as
a tiny SGD update inside a donated carry scan.
"""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

ITERS = 10


def timed(name, make_loop, state):
    jitted = jax.jit(make_loop, donate_argnums=(0,))
    state, warm = jitted(state)
    np.asarray(warm)
    t0 = time.perf_counter()
    state, out = jitted(state)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s}{dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from sovits_tpu import config as scfg
    from sovits_tpu.dsp.sequence import slice_segments
    from sovits_tpu.dsp.stft import mel_spectrogram, spec_to_mel
    from sovits_tpu.models import factory
    from sovits_tpu.train.losses import (
        discriminator_loss, feature_loss, generator_loss, kl_loss,
    )

    hps = scfg.default_config()
    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    disc = factory.build_discriminator(hps, dtype=jnp.bfloat16)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        g_params = factory.init_synthesizer_params(
            syn, jax.random.PRNGKey(0), hps, t_frames=16
        )
        d_params = factory.init_discriminator_params(
            disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
        )
    dev = jax.devices()[0]
    g_params = jax.device_put(g_params, dev)
    d_params = jax.device_put(d_params, dev)
    copy_tree = jax.jit(lambda p: jax.tree.map(lambda a: a + 0, p))

    rng = np.random.default_rng(0)
    b, t, hop = 6, 512, hps.data.hop_length
    seg_samples = hps.train.segment_size
    seg_frames = seg_samples // hop
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
    mel_kw = dict(
        n_fft=hps.data.filter_length, n_mels=hps.data.n_mel_channels,
        sample_rate=hps.data.sampling_rate, fmin=hps.data.mel_fmin,
        fmax=hps.data.mel_fmax,
    )
    rngs = {
        "noise": jax.random.PRNGKey(1),
        "slice": jax.random.PRNGKey(2),
        "dropout": jax.random.PRNGKey(3),
    }

    def gen_forward(g_p, i):
        bt = dict(batch)
        bt["c"] = batch["c"] + (i * 1e-6).astype(jnp.float32)
        return syn.apply(
            {"params": g_p}, bt["c"], bt["f0"], bt["uv"], bt["spec"],
            bt["spk"], bt["lengths"], vol=bt["volume"],
            deterministic=False, rngs=rngs,
        )

    def sgd_loop(loss_fn):
        def make(gp):
            def body(p, i):
                g = jax.grad(loss_fn)(p, jnp.float32(0.0))
                p = jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
                return p, None
            gp2, _ = jax.lax.scan(body, gp, jnp.arange(ITERS))
            return gp2, jax.tree.leaves(gp2)[0].astype(jnp.float32).sum()
        return make

    # 1) pure generator bwd (no loss machinery)
    def l_pure(g_p, i):
        y_hat_g, *_ = gen_forward(g_p, i)
        return jnp.mean(jnp.abs(y_hat_g.astype(jnp.float32)))

    timed("grad: y_hat only (pure G bwd)", sgd_loop(l_pure), copy_tree(g_params))

    # 2) + mel L1
    def l_mel(g_p, i):
        y_hat_g, ids, *_ = gen_forward(g_p, i)
        mel_all = spec_to_mel(batch["spec"], **mel_kw)
        y_mel = slice_segments(mel_all, ids, seg_frames)
        y_hat_mel = mel_spectrogram(
            y_hat_g[..., 0], hop_length=hop, win_length=hps.data.win_length,
            **mel_kw,
        )
        return jnp.mean(jnp.abs(y_mel - y_hat_mel)) * hps.train.c_mel

    timed("grad: mel L1 (G bwd + stft bwd)", sgd_loop(l_mel), copy_tree(g_params))

    # 3) + D in the loss (fm + gen)
    def l_disc(g_p, i):
        y_hat_g, ids, *_ = gen_forward(g_p, i)
        y_seg = slice_segments(batch["wav"], ids * hop, seg_samples)
        _, f_logits, fmap_r, fmap_g = disc.apply(
            {"params": d_params}, y_seg, y_hat_g
        )
        return feature_loss(fmap_r, fmap_g) + generator_loss(f_logits)[0]

    timed("grad: fm+gen (G bwd + D fwd/bwd)", sgd_loop(l_disc), copy_tree(g_params))

    # 4) kl only
    def l_kl(g_p, i):
        (_y, _ids, spec_mask, (z, z_p, m_p, logs_p, m_q, logs_q),
         *_rest) = gen_forward(g_p, i)
        return kl_loss(z_p, logs_q, m_p, logs_p, spec_mask) * hps.train.c_kl

    timed("grad: kl only", sgd_loop(l_kl), copy_tree(g_params))

    # 5) D own fwd+bwd on FIXED inputs (no G forward at all)
    y_hat0 = jax.jit(lambda p: gen_forward(p, jnp.float32(0.0))[0])(g_params)
    ids0 = jax.jit(lambda p: gen_forward(p, jnp.float32(0.0))[1])(g_params)
    y_seg0 = jax.jit(
        lambda w, i: slice_segments(w, i * hop, seg_samples)
    )(batch["wav"], ids0)

    def l_donly(d_p, i):
        r_logits, f_logits, _, _ = disc.apply(
            {"params": d_p}, y_seg0 + i * 1e-9, y_hat0
        )
        return discriminator_loss(r_logits, f_logits)[0]

    timed("grad: D only (fixed y/y_hat)", sgd_loop(l_donly), copy_tree(d_params))


if __name__ == "__main__":
    main()
