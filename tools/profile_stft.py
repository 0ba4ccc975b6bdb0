"""Compare FFT-based vs DFT-matmul spectrogram on chip + generator fwd breakdown."""

import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))


def scan_time(fn, *args, iters=100):
    def loop(*a):
        def body(carry, i):
            out = fn(*a)
            return carry + jax.tree.leaves(out)[0].sum().astype(jnp.float32), None

        return jax.lax.scan(
            body, jnp.zeros((), jnp.float32), jnp.arange(iters, dtype=jnp.float32)
        )[0]

    jitted = jax.jit(loop)
    np.asarray(jitted(*args))
    t0 = time.perf_counter()
    np.asarray(jitted(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from sovits_tpu.dsp import stft as dstft

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((6, 10240)), jnp.float32)

    t_floor = scan_time(lambda w: w * 1.000001, y)
    print(f"measurement floor (noop):   {t_floor*1e3:7.3f} ms")

    t_fft = scan_time(lambda w: dstft.spectrogram(w, 2048, 512, 2048), y)
    print(f"spectrogram (jnp.fft.rfft): {t_fft*1e3:7.3f} ms")

    def dft_spec(w):
        pad = (2048 - 512) // 2
        w = jnp.pad(w, ((0, 0), (pad, pad)), mode="reflect")
        frames = dstft.frame_signal(w, 2048, 512)
        from sovits_tpu.dsp.mel import hann_window

        frames = frames * jnp.asarray(hann_window(2048))
        n = jnp.arange(2048, dtype=jnp.int32)
        k = jnp.arange(1025, dtype=jnp.int32)
        # reduce n*k mod N in integers first: cos of huge f32 angles is junk
        ang = (2 * jnp.pi / 2048) * ((n[:, None] * k[None, :]) % 2048).astype(jnp.float32)
        wc, ws = jnp.cos(ang), jnp.sin(ang)
        re = jnp.matmul(frames, wc, precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, ws, precision=jax.lax.Precision.HIGHEST)
        return jnp.sqrt(re * re + im * im + 1e-6)

    t_dft = scan_time(dft_spec, y)
    print(f"spectrogram (DFT matmul):   {t_dft*1e3:7.3f} ms")

    a = jax.jit(lambda w: dstft.spectrogram(w, 2048, 512, 2048))(y)
    b = jax.jit(dft_spec)(y)
    print("max abs diff:", float(jnp.abs(a - b).max()), " rel:",
          float((jnp.abs(a - b) / (jnp.abs(a) + 1e-6)).max()))

    # ---- generator forward breakdown at train shapes ----
    from sovits_tpu import config as scfg
    from sovits_tpu.models import factory

    hps = scfg.default_config()
    syn = factory.build_synthesizer(hps, dtype=jnp.bfloat16)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        g_params = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
    g_params = jax.device_put(g_params, jax.devices()[0])

    b_, t = 6, 512
    batch = {
        "c": jnp.asarray(rng.standard_normal((b_, t, hps.model.ssl_dim)), jnp.float32),
        "f0": jnp.asarray(rng.uniform(80, 400, (b_, t)), jnp.float32),
        "uv": jnp.ones((b_, t), jnp.float32),
        "spec": jnp.asarray(
            np.abs(rng.standard_normal((b_, t, hps.data.filter_length // 2 + 1))), jnp.float32
        ),
        "spk": jnp.zeros((b_,), jnp.int32),
        "lengths": jnp.full((b_,), t, jnp.int32),
        "volume": jnp.abs(jnp.asarray(rng.standard_normal((b_, t)), jnp.float32)) * 0.05,
    }
    rngs = {
        "noise": jax.random.PRNGKey(0),
        "slice": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }

    from sovits_tpu.dsp.f0 import f0_to_coarse
    from sovits_tpu.dsp.sequence import sequence_mask

    def sub(fn_name, fn):
        t_ = scan_time(fn)
        print(f"{fn_name:28s}{t_*1e3:7.3f} ms")

    def bound(method):
        def run(*a, **kw):
            return syn.apply({"params": g_params}, *a, method=method,
                             rngs=rngs, **kw)
        return run

    x_mask = sequence_mask(batch["lengths"], t)[..., None].astype(jnp.bfloat16)

    prenet = bound(lambda m, c, uv, vol, mask: m._prenet(c, uv, vol, mask))
    x_hid = jax.jit(prenet)(batch["c"], batch["uv"], batch["volume"], x_mask)
    g_emb = jax.jit(bound(lambda m, s: m._speaker_embedding(s)))(batch["spk"])

    sub("prenet:", lambda: prenet(batch["c"], batch["uv"], batch["volume"], x_mask))
    sub("enc_p (prior):", lambda: bound(
        lambda m, x, mask, fc: m.enc_p(x, mask, fc, rng=None)[1]
    )(x_hid, x_mask, f0_to_coarse(batch["f0"])))
    sub("f0_decoder:", lambda: bound(
        lambda m, x, nl, mask, g: m.f0_decoder(x, nl, mask, spk_emb=g,
                                               deterministic=False)
    )(x_hid, jnp.zeros((b_, t, 1), jnp.bfloat16), x_mask, g_emb))
    sub("enc_q (posterior):", lambda: bound(
        lambda m, s, ln, g: m.enc_q(s, ln, g=g, rng=jax.random.PRNGKey(2))[0]
    )(batch["spec"], batch["lengths"], g_emb))

    z = jnp.asarray(rng.standard_normal((b_, t, hps.model.inter_channels)), jnp.bfloat16)
    sub("flow (fwd):", lambda: bound(
        lambda m, zz, mask, g: m.flow(zz, mask, g=g, deterministic=False)
    )(z, x_mask, g_emb))

    seg_frames = hps.train.segment_size // hps.data.hop_length
    zseg = jnp.asarray(rng.standard_normal((b_, seg_frames, hps.model.inter_channels)), jnp.bfloat16)
    f0seg = jnp.asarray(rng.uniform(80, 400, (b_, seg_frames)), jnp.float32)
    sub("vocoder on seg:", lambda: bound(
        lambda m, zz, ff, g: m.dec(zz, ff, g=g, rng=jax.random.PRNGKey(3))
    )(zseg, f0seg, g_emb))

    # ---- full-step pieces: G grad (full GAN loss), D grad, optimizer ----
    from sovits_tpu import train as strain
    from sovits_tpu.dsp.sequence import slice_segments
    from sovits_tpu.dsp.stft import mel_spectrogram, spec_to_mel

    disc = factory.build_discriminator(hps, dtype=jnp.bfloat16)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        d_params = factory.init_discriminator_params(
            disc, jax.random.PRNGKey(1), seg_samples=hps.train.segment_size
        )
    d_params = jax.device_put(d_params, jax.devices()[0])
    hop = hps.data.hop_length
    batch["wav"] = jnp.asarray(rng.standard_normal((b_, t * hop, 1)) * 0.1, jnp.float32)
    mel_kw = dict(
        n_fft=hps.data.filter_length, n_mels=hps.data.n_mel_channels,
        sample_rate=hps.data.sampling_rate, fmin=hps.data.mel_fmin,
        fmax=hps.data.mel_fmax,
    )
    from sovits_tpu.train.losses import (
        discriminator_loss, feature_loss, generator_loss, kl_loss,
    )

    def gen_forward(g_p):
        return syn.apply(
            {"params": g_p}, batch["c"], batch["f0"], batch["uv"],
            batch["spec"], batch["spk"], batch["lengths"], vol=batch["volume"],
            deterministic=False, rngs=rngs,
        )

    y_hat0, ids0, *_ = jax.jit(gen_forward)(g_params)
    y_seg = slice_segments(batch["wav"], ids0 * hop, hps.train.segment_size)
    mel_all = jax.jit(lambda s: spec_to_mel(s, **mel_kw))(batch["spec"])
    y_mel = slice_segments(mel_all, ids0, seg_frames)

    def d_loss_fn(d_p, y_seg_, y_hat_):
        r_logits, f_logits, _, _ = disc.apply({"params": d_p}, y_seg_, y_hat_)
        return discriminator_loss(r_logits, f_logits)[0]

    t_ = scan_time(lambda dp, a, b2: jax.tree.leaves(jax.grad(d_loss_fn)(dp, a, b2))[0],
                   d_params, y_seg, y_hat0)
    print(f"{'D step grad:':28s}{t_*1e3:7.3f} ms")

    def g_loss_fn(g_p, batch, y_seg, y_mel):
        (y_hat_g, _ids, spec_mask, (z, z_p, m_p, logs_p, m_q, logs_q),
         pred_lf0, norm_lf0, lf0) = syn.apply(
            {"params": g_p}, batch["c"], batch["f0"], batch["uv"],
            batch["spec"], batch["spk"], batch["lengths"], vol=batch["volume"],
            deterministic=False, rngs=rngs,
        )
        y_hat_mel = mel_spectrogram(
            y_hat_g[..., 0], hop_length=hop, win_length=hps.data.win_length,
            **mel_kw,
        )
        _, f_logits, fmap_r, fmap_g = disc.apply({"params": d_params}, y_seg, y_hat_g)
        loss = (
            jnp.mean(jnp.abs(y_mel - y_hat_mel)) * hps.train.c_mel
            + kl_loss(z_p, logs_q, m_p, logs_p, spec_mask) * hps.train.c_kl
            + feature_loss(fmap_r, fmap_g)
            + generator_loss(f_logits)[0]
            + jnp.mean((pred_lf0 - lf0) ** 2)
        )
        return loss

    t_ = scan_time(lambda gp, bt, ys, ym: jax.tree.leaves(jax.grad(g_loss_fn)(gp, bt, ys, ym))[0],
                   g_params, batch, y_seg, y_mel)
    print(f"{'G step grad (full loss):':28s}{t_*1e3:7.3f} ms")

    g_tx = strain.make_optimizer(hps)
    g_opt = jax.jit(g_tx.init)(g_params)
    g_grads = jax.jit(jax.grad(g_loss_fn))(g_params, batch, y_seg, y_mel)

    def opt_update(grads, opt_state, params):
        upd, new_opt = g_tx.update(grads, opt_state, params)
        return jax.tree.leaves(optax_apply(params, upd))[0]

    import optax

    def optax_apply(params, upd):
        return optax.apply_updates(params, upd)

    sub("G optimizer update:", lambda: opt_update(g_grads, g_opt, g_params))


if __name__ == "__main__":
    main()
