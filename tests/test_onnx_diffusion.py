"""Diffusion ONNX export parity (r3 VERDICT next #5).

Emits the four MoeSS diffusion artifacts (encoder/denoise/pred/after,
export/onnx_diffusion.py) for a tiny Unit2Mel, executes them through the
in-repo numpy ONNX runtime, and pins each against the JAX modules — plus a
full PLMS sampling loop driven EXACTLY the way MoeSS drives the graphs
(reference diffusion_onnx.py:494-559: denoise/pred graphs + the
predict_stage0-3 noise-history arithmetic runtime-side), compared to
``DiffusionSchedule.sample_plms`` on the same initial noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sovits_tpu.export.onnx_diffusion import build_diffusion_onnx
from sovits_tpu.export.onnx_run import run_model
from sovits_tpu.models.diffusion.unit2mel import Unit2Mel

T = 24
TINY = dict(
    input_channel=20,
    n_spk=2,
    out_dims=12,
    n_layers=2,
    n_chans=32,
    n_hidden=16,
    timesteps=50,
    k_step_max=50,
)


@pytest.fixture(scope="module")
def setup():
    model = Unit2Mel(**TINY)
    rng = np.random.default_rng(0)
    units = rng.standard_normal((1, T, TINY["input_channel"])).astype(np.float32) * 0.3
    f0 = rng.uniform(80, 400, (1, T)).astype(np.float32)
    volume = np.abs(rng.standard_normal((1, T))).astype(np.float32) * 0.1
    mix = rng.uniform(0.2, 0.8, (T, TINY["n_spk"])).astype(np.float32)
    mix /= mix.sum(axis=1, keepdims=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        spk_id=jnp.zeros((1,), jnp.int32), infer=False,
        gt_spec=jnp.zeros((1, T, TINY["out_dims"]), jnp.float32),
    )
    params = jax.tree.map(np.asarray, variables["params"])
    graphs = build_diffusion_onnx(params, model)
    return model, params, graphs, units, f0, volume, mix


def test_encoder_parity(setup):
    model, params, graphs, units, f0, volume, mix = setup
    got = run_model(
        graphs["encoder"],
        {
            "hubert": units,
            "mel2ph": np.arange(1, T + 1, dtype=np.int64)[None],
            "f0": f0,
            "volume": volume,
            "spk_mix": mix,
        },
    )["mel_pred"]
    want = model.apply(
        {"params": params},
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray(mix)[None],  # per-frame mix [B, T, S]
        method=Unit2Mel.condition,
    )
    want = np.asarray(want).transpose(0, 2, 1)  # [1, H, T]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_denoise_parity(setup):
    model, params, graphs, *_ = setup
    rng = np.random.default_rng(1)
    noise = rng.standard_normal((1, 1, TINY["out_dims"], T)).astype(np.float32)
    cond = rng.standard_normal((1, TINY["n_hidden"], T)).astype(np.float32) * 0.3
    t_step = np.asarray([17], np.int64)
    got = run_model(
        graphs["denoise"], {"noise": noise, "time": t_step, "condition": cond}
    )["noise_pred"]
    want = model.apply(
        {"params": params},
        jnp.asarray(noise[:, 0].transpose(0, 2, 1)),  # [B, T, M]
        jnp.asarray([17]),
        jnp.asarray(cond.transpose(0, 2, 1)),  # [B, T, H]
        method=lambda m, x, t, c: m.denoiser(x, t, c),
    )
    want = np.asarray(want).transpose(0, 2, 1)[:, None]  # [1, 1, M, T]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pred_and_after_parity(setup):
    model, params, graphs, *_ = setup
    sched = model.schedule
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, TINY["out_dims"], T)).astype(np.float32)
    noise_t = rng.standard_normal((1, 1, TINY["out_dims"], T)).astype(np.float32)
    t1, t_prev = 40, 15
    got = run_model(
        graphs["pred"],
        {
            "noise": x, "noise_pred": noise_t,
            "time": np.asarray([t1], np.int64),
            "time_prev": np.asarray([t_prev], np.int64),
        },
    )["noise_pred_o"]
    # reference arithmetic (diffusion_onnx.py:473-480)
    a_t = np.float32(sched.alphas_cumprod[t1])
    a_prev = np.float32(sched.alphas_cumprod[t_prev])
    a_t_sq, a_prev_sq = np.sqrt(a_t), np.sqrt(a_prev)
    x_delta = (a_prev - a_t) * (
        (1.0 / (a_t_sq * (a_t_sq + a_prev_sq))) * x
        - 1.0
        / (a_t_sq * (np.sqrt((1 - a_prev) * a_t) + np.sqrt((1 - a_t) * a_prev)))
        * noise_t
    )
    np.testing.assert_allclose(got, x + x_delta, rtol=1e-5, atol=1e-6)

    got_mel = run_model(graphs["after"], {"x": x})["mel_out"]
    want_mel = np.asarray(sched.denorm_spec(jnp.asarray(x[:, 0])))
    np.testing.assert_allclose(got_mel, want_mel, rtol=1e-5, atol=1e-6)


def _plms_loop_via_onnx(graphs, x, cond, k_step, speedup):
    """Replay the MoeSS-side PLMS driver (diffusion_onnx.py:494-559)."""

    def denoise(x, t):
        return run_model(
            graphs["denoise"],
            {"noise": x, "time": np.asarray([t], np.int64), "condition": cond},
        )["noise_pred"]

    def x_pred(x, noise_pred, t, t_prev):
        return run_model(
            graphs["pred"],
            {
                "noise": x, "noise_pred": noise_pred,
                "time": np.asarray([t], np.int64),
                "time_prev": np.asarray([t_prev], np.int64),
            },
        )["noise_pred_o"]

    noise_list = []
    stage = 0
    for t in range(k_step - speedup, -1, -speedup):
        np_t = denoise(x, t)
        t_prev = max(t - speedup, 0)
        if stage == 0:
            xp = x_pred(x, np_t, t, t_prev)
            np_prev = denoise(xp, t_prev)
            np_prime = (np_t + np_prev) / 2.0
        elif stage == 1:
            np_prime = (3.0 * np_t - noise_list[-1]) / 2.0
        elif stage == 2:
            np_prime = (23.0 * np_t - 16.0 * noise_list[-1] + 5.0 * noise_list[-2]) / 12.0
        else:
            np_prime = (
                55.0 * np_t - 59.0 * noise_list[-1] + 37.0 * noise_list[-2]
                - 9.0 * noise_list[-3]
            ) / 24.0
        noise_list = (noise_list + [np_t])[-3:]
        if stage < 3:
            stage += 1
        x = x_pred(x, np_prime, t, t_prev)
    return run_model(graphs["after"], {"x": x})["mel_out"]


def test_full_plms_loop_matches_jax(setup):
    """Four-graph PLMS loop == DiffusionSchedule.sample_plms end to end."""
    model, params, graphs, units, f0, volume, mix = setup
    sched = model.schedule
    rng = np.random.default_rng(3)
    x0 = rng.standard_normal((1, 1, TINY["out_dims"], T)).astype(np.float32)
    cond = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            jnp.asarray(mix)[None],
            method=Unit2Mel.condition,
        )
    )  # [B, T, H]
    speedup, k_step = 10, TINY["timesteps"]

    got = _plms_loop_via_onnx(
        graphs, x0, cond.transpose(0, 2, 1).astype(np.float32), k_step, speedup
    )

    def denoise_fn(x, t, c):
        return model.apply(
            {"params": params}, x, t, c, method=lambda m, x, t, c: m.denoiser(x, t, c)
        )

    want_x = sched.sample_plms(
        denoise_fn,
        jnp.asarray(x0[:, 0].transpose(0, 2, 1)),  # [B, T, M]
        k_step, speedup, jnp.asarray(cond),
    )
    want = np.asarray(sched.denorm_spec(want_x)).transpose(0, 2, 1)  # [1, M, T]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_export_cli_diffusion(tmp_path):
    """`cli.export --onnx --diffusion` writes the four MoeSS artifacts from
    a train_diffusion-format .npz checkpoint."""
    import yaml

    from sovits_tpu.cli import export as export_cli
    from sovits_tpu.cli.tools import flatten_params
    from sovits_tpu.train.diffusion import build_unit2mel, load_diffusion_config

    diff_cfg = {
        "data": {"sampling_rate": 8000, "block_size": 64, "duration": 0.256,
                 "encoder_out_channels": TINY["input_channel"]},
        "model": {"n_layers": TINY["n_layers"], "n_chans": TINY["n_chans"],
                  "n_hidden": TINY["n_hidden"], "timesteps": TINY["timesteps"],
                  "k_step_max": 0, "n_spk": TINY["n_spk"], "use_pitch_aug": False},
        "vocoder": {"type": "nsf-hifigan", "ckpt": "missing"},
        "spk": {"a": 0, "b": 1},
    }
    cfg_path = tmp_path / "diffusion.yaml"
    cfg_path.write_text(yaml.safe_dump(diff_cfg))

    model = build_unit2mel(load_diffusion_config(cfg_path), TINY["out_dims"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, T, TINY["input_channel"])), jnp.zeros((1, T)),
        jnp.zeros((1, T)), spk_id=jnp.zeros((1,), jnp.int32), infer=False,
        gt_spec=jnp.zeros((1, T, TINY["out_dims"]), jnp.float32),
    )
    ckpt = tmp_path / "model_10.npz"
    np.savez_compressed(ckpt, **flatten_params(jax.device_get(variables["params"])))

    export_cli.main([
        "-m", str(ckpt), "-c", str(cfg_path),
        "-o", str(tmp_path / "proj"), "--onnx", "--diffusion",
    ])
    for suffix in ("encoder", "denoise", "pred", "after"):
        p = tmp_path / f"proj_{suffix}.onnx"
        assert p.exists() and p.stat().st_size > 100, suffix
