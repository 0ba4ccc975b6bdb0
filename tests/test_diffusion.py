"""Parity tests: diffusion stack vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_ref import setup_reference_imports, state_dict_numpy

setup_reference_imports()

from diffusion import diffusion as ref_diffusion  # noqa: E402
from diffusion import wavenet as ref_wavenet_mod  # noqa: E402

from sovits_tpu.convert import from_torch as ft  # noqa: E402
from sovits_tpu.models.diffusion import (  # noqa: E402
    DiffusionSchedule,
    DiffusionWaveNet,
    Unit2Mel,
)

M, LAYERS, CHANS, HIDDEN, TSTEPS = 16, 3, 32, 24, 50
B, T = 2, 12


def _ref_pair(seed=0):
    torch.manual_seed(seed)
    ref_net = ref_wavenet_mod.WaveNet(M, LAYERS, CHANS, HIDDEN)
    ref_net.eval()
    mine = DiffusionWaveNet(in_dims=M, n_layers=LAYERS, n_chans=CHANS, n_hidden=HIDDEN)
    params = {
        "params": jax.tree.map(
            jnp.asarray, ft.diffusion_wavenet(state_dict_numpy(ref_net), n_layers=LAYERS)
        )
    }
    return ref_net, mine, params


def _inputs(seed=1):
    rng = np.random.default_rng(seed)
    spec = rng.standard_normal((B, T, M)).astype(np.float32)
    cond = rng.standard_normal((B, T, HIDDEN)).astype(np.float32)
    t = np.array([3, 17], dtype=np.int64)
    return spec, cond, t


def _ref_denoise(ref_net, spec, t, cond):
    with torch.no_grad():
        out = ref_net(
            torch.from_numpy(spec.transpose(0, 2, 1))[:, None],
            torch.from_numpy(t),
            torch.from_numpy(cond.transpose(0, 2, 1)),
        )
    return out.numpy()[:, 0].transpose(0, 2, 1)  # [B, T, M]


def test_diffusion_wavenet_matches_reference():
    ref_net, mine, params = _ref_pair()
    spec, cond, t = _inputs()
    ref = _ref_denoise(ref_net, spec, t, cond)
    got = np.asarray(
        mine.apply(params, jnp.asarray(spec), jnp.asarray(t.astype(np.float32)), jnp.asarray(cond))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def _ref_gaussian(ref_net):
    gd = ref_diffusion.GaussianDiffusion(
        ref_net, out_dims=M, timesteps=TSTEPS, k_step=TSTEPS, spec_min=-12, spec_max=2
    )
    gd.eval()
    return gd


def test_p_losses_matches_reference():
    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, t = _inputs()
    rng = np.random.default_rng(2)
    noise = rng.standard_normal((B, T, M)).astype(np.float32)

    with torch.no_grad():
        ref_loss = gd.p_losses(
            torch.from_numpy(spec.transpose(0, 2, 1))[:, None],
            torch.from_numpy(t),
            torch.from_numpy(cond.transpose(0, 2, 1)),
            noise=torch.from_numpy(noise.transpose(0, 2, 1))[:, None],
        ).item()

    def denoise_fn(x, tt, c):
        return mine.apply(params, x, tt, c)

    got = float(
        sched.p_losses(denoise_fn, jnp.asarray(spec), jnp.asarray(t), jnp.asarray(cond), jnp.asarray(noise))
    )
    np.testing.assert_allclose(got, ref_loss, rtol=1e-4)


def _x_init(gd, sched, spec, k_step, b=B):
    """Matched shallow-diffusion starting point on both sides."""
    rng = np.random.default_rng(3)
    noise = rng.standard_normal((b, T, M)).astype(np.float32)
    norm_t = gd.norm_spec(torch.from_numpy(spec))  # [B, T, M]
    x_t = gd.q_sample(
        norm_t.transpose(1, 2)[:, None],
        torch.tensor([k_step - 1]).long(),
        noise=torch.from_numpy(noise.transpose(0, 2, 1))[:, None],
    )
    norm_j = sched.norm_spec(jnp.asarray(spec))
    x_j = sched.q_sample(
        norm_j, jnp.full((b,), k_step - 1, jnp.int32), jnp.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(x_j), x_t.numpy()[:, 0].transpose(0, 2, 1), rtol=1e-5, atol=1e-6)
    return x_t, x_j


def test_ddim_sampler_matches_reference():
    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    k_step, speedup = 20, 4
    x_t, x_j = _x_init(gd, sched, spec, k_step)

    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    with torch.no_grad():
        x = x_t
        for i in reversed(range(0, k_step, speedup)):
            x = gd.p_sample_ddim(x, torch.full((B,), i, dtype=torch.long), speedup, cond_t)
    ref = gd.denorm_spec(x.squeeze(1).transpose(1, 2)).numpy()

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    got = sched.denorm_spec(
        sched.sample_ddim(denoise_fn, x_j, k_step, speedup, jnp.asarray(cond))
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)


def test_plms_sampler_matches_reference():
    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    # reference p_sample_plms only supports batch 1 (python max() on the t
    # tensor, diffusion.py:189)
    spec, cond = spec[:1], cond[:1]
    k_step, speedup = 40, 2  # 20 steps exercises the scan path (>3 history)
    x_t, x_j = _x_init(gd, sched, spec, k_step, b=1)

    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    from collections import deque

    gd.noise_list = deque(maxlen=4)
    with torch.no_grad():
        x = x_t
        for i in reversed(range(0, k_step, speedup)):
            x = gd.p_sample_plms(x, torch.full((1,), i, dtype=torch.long), speedup, cond_t)
    ref = gd.denorm_spec(x.squeeze(1).transpose(1, 2)).numpy()

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    got = sched.denorm_spec(
        sched.sample_plms(denoise_fn, x_j, k_step, speedup, jnp.asarray(cond))
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=3e-4)


def _ref_dpmpp(gd, ref_net, x_t, cond, k_step, steps):
    from diffusion.dpm_solver_pytorch import DPM_Solver, NoiseScheduleVP, model_wrapper

    ns = NoiseScheduleVP(schedule="discrete", betas=gd.betas[:k_step])
    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    model_fn = model_wrapper(
        gd.denoise_fn, ns, model_type="noise", model_kwargs={"cond": cond_t}
    )
    solver = DPM_Solver(model_fn, ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        x = solver.sample(x_t, steps=steps, order=2, skip_type="time_uniform", method="multistep")
    return gd.denorm_spec(x.squeeze(1).transpose(1, 2)).numpy()


def _run_dpmpp_case(k_step, speedup):
    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    x_t, x_j = _x_init(gd, sched, spec, k_step)
    steps = k_step // speedup
    ref = _ref_dpmpp(gd, ref_net, x_t, cond, k_step, steps)

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    got = sched.denorm_spec(
        sched.sample_dpmpp_2m(denoise_fn, x_j, k_step, steps, jnp.asarray(cond))
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=3e-4)


def test_dpmpp_2m_few_steps_matches_reference():
    _run_dpmpp_case(k_step=20, speedup=4)  # 5 steps -> lower_order_final path


def test_dpmpp_2m_many_steps_matches_reference():
    _run_dpmpp_case(k_step=40, speedup=2)  # 20 steps -> scan path


def _ref_dpmpp_singlestep(gd, x_t, cond, k_step, steps, order):
    from diffusion.dpm_solver_pytorch import DPM_Solver, NoiseScheduleVP, model_wrapper

    ns = NoiseScheduleVP(schedule="discrete", betas=gd.betas[:k_step])
    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    model_fn = model_wrapper(
        gd.denoise_fn, ns, model_type="noise", model_kwargs={"cond": cond_t}
    )
    solver = DPM_Solver(model_fn, ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        x = solver.sample(x_t, steps=steps, order=order,
                          skip_type="time_uniform", method="singlestep")
    return gd.denorm_spec(x.squeeze(1).transpose(1, 2)).numpy()


@pytest.mark.parametrize("order,k_step,speedup", [
    (2, 20, 2),   # 10 steps -> 5 uniform order-2 blocks
    (2, 20, 4),   # 5 steps -> [2,2,1] tail path
    (3, 36, 2),   # 18 steps -> [3]*5+[2,1]
    (3, 20, 2),   # 10 steps -> [3]*3+[1]
])
def test_dpmpp_singlestep_matches_reference(order, k_step, speedup):
    """Singlestep DPM-Solver++ parity vs the vendored solver
    (dpm_solver_pytorch.py:335-1253 breadth)."""
    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    x_t, x_j = _x_init(gd, sched, spec, k_step)
    steps = k_step // speedup
    ref = _ref_dpmpp_singlestep(gd, x_t, cond, k_step, steps, order)

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    got = sched.denorm_spec(
        sched.sample_dpmpp_singlestep(
            denoise_fn, x_j, k_step, steps, jnp.asarray(cond), order=order
        )
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=5e-4)


def test_unit2mel_end_to_end_smoke():
    model = Unit2Mel(
        input_channel=24,
        n_spk=3,
        use_pitch_aug=True,
        out_dims=M,
        n_layers=LAYERS,
        n_chans=CHANS,
        n_hidden=HIDDEN,
        timesteps=TSTEPS,
        k_step_max=TSTEPS,
    )
    rng = np.random.default_rng(5)
    units = jnp.asarray(rng.standard_normal((1, T, 24)), jnp.float32)
    f0 = jnp.asarray(rng.uniform(100, 300, (1, T)), jnp.float32)
    vol = jnp.asarray(np.abs(rng.standard_normal((1, T))) * 0.1, jnp.float32)
    spk = jnp.asarray([1], jnp.int32)
    gt = jnp.asarray(rng.standard_normal((1, T, M)) * 2 - 6, jnp.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        units, f0, vol, spk_id=spk, gt_spec=gt, infer=False,
    )
    loss = model.apply(
        variables, units, f0, vol, spk_id=spk, gt_spec=gt, infer=False,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(loss))

    mel = model.apply(
        variables, units, f0, vol, spk_id=spk, gt_spec=gt, infer=True,
        infer_speedup=10, sampler="dpm-solver++", k_step=20,
        rngs={"noise": jax.random.PRNGKey(3)},
    )
    assert mel.shape == (1, T, M)
    assert np.isfinite(np.asarray(mel)).all()

    # spk-mix weights
    mix = jnp.asarray([[0.5, 0.25, 0.25]], jnp.float32)
    mel2 = model.apply(
        variables, units, f0, vol, spk_id=mix, gt_spec=gt, infer=True,
        infer_speedup=4, sampler="ddim", k_step=20,
        rngs={"noise": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(np.asarray(mel2)).all()


def test_unit2mel_converter_matches_reference_conditioning():
    setup_reference_imports()
    from diffusion import unit2mel as ref_u2m_mod

    torch.manual_seed(7)
    ref_model = ref_u2m_mod.Unit2Mel(
        24, 3, True, M, n_layers=LAYERS, n_chans=CHANS, n_hidden=HIDDEN,
        timesteps=TSTEPS, k_step_max=TSTEPS,
    )
    ref_model.eval()

    rng = np.random.default_rng(8)
    units = rng.standard_normal((1, T, 24)).astype(np.float32)
    f0 = rng.uniform(100, 300, (1, T, 1)).astype(np.float32)
    vol = (np.abs(rng.standard_normal((1, T, 1))) * 0.1).astype(np.float32)
    spk = np.array([[1]], dtype=np.int64)

    with torch.no_grad():
        x = (
            ref_model.unit_embed(torch.from_numpy(units))
            + ref_model.f0_embed((1 + torch.from_numpy(f0) / 700).log())
            + ref_model.volume_embed(torch.from_numpy(vol))
        )
        x = x + ref_model.spk_embed(torch.from_numpy(spk) - 1).squeeze(1)[:, None]
    # (reference adds spk_embed(spk_id - 1) at unit2mel.py:114 in one branch
    #  and spk_embed(spk_id) at :161 in the other; we mirror the :161 path)
    with torch.no_grad():
        x161 = (
            ref_model.unit_embed(torch.from_numpy(units))
            + ref_model.f0_embed((1 + torch.from_numpy(f0) / 700).log())
            + ref_model.volume_embed(torch.from_numpy(vol))
            + ref_model.spk_embed(torch.from_numpy(spk))
        )

    mine = Unit2Mel(
        input_channel=24, n_spk=3, use_pitch_aug=True, out_dims=M,
        n_layers=LAYERS, n_chans=CHANS, n_hidden=HIDDEN,
        timesteps=TSTEPS, k_step_max=TSTEPS,
    )
    params = {"params": jax.tree.map(jnp.asarray, ft.unit2mel(state_dict_numpy(ref_model), n_layers=LAYERS))}
    got = mine.apply(
        params,
        jnp.asarray(units),
        jnp.asarray(f0[..., 0]),
        jnp.asarray(vol[..., 0]),
        jnp.asarray([1], jnp.int32),
        method=Unit2Mel.condition,
    )
    np.testing.assert_allclose(np.asarray(got), x161.numpy(), rtol=1e-4, atol=1e-5)


def _ref_unipc(gd, x_t, cond, k_step, steps):
    from diffusion.uni_pc import NoiseScheduleVP, UniPC, model_wrapper

    ns = NoiseScheduleVP(schedule="discrete", betas=gd.betas[:k_step])
    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    model_fn = model_wrapper(
        gd.denoise_fn, ns, model_type="noise", model_kwargs={"cond": cond_t}
    )
    solver = UniPC(model_fn, ns, variant="bh2")
    with torch.no_grad():
        x = solver.sample(x_t, steps=steps, order=2, skip_type="time_uniform", method="multistep")
    return gd.denorm_spec(x.squeeze(1).transpose(1, 2)).numpy()


def _run_unipc_case(k_step, speedup):
    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    x_t, x_j = _x_init(gd, sched, spec, k_step)
    steps = k_step // speedup
    ref = _ref_unipc(gd, x_t, cond, k_step, steps)

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    got = sched.denorm_spec(
        sched.sample_unipc_bh2(denoise_fn, x_j, k_step, steps, jnp.asarray(cond))
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=5e-4)


def test_unipc_bh2_few_steps_matches_reference():
    _run_unipc_case(k_step=20, speedup=4)  # 5 steps


def test_unipc_bh2_many_steps_matches_reference():
    _run_unipc_case(k_step=40, speedup=2)  # 20 steps


def test_unipc_bh1_matches_reference():
    """bh1 variant parity (uni_pc.py:238+ B(h) = h branch)."""
    from diffusion.uni_pc import NoiseScheduleVP, UniPC, model_wrapper

    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    k_step, steps = 40, 20
    x_t, x_j = _x_init(gd, sched, spec, k_step)

    ns = NoiseScheduleVP(schedule="discrete", betas=gd.betas[:k_step])
    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    model_fn = model_wrapper(
        gd.denoise_fn, ns, model_type="noise", model_kwargs={"cond": cond_t}
    )
    solver = UniPC(model_fn, ns, variant="bh1")
    with torch.no_grad():
        x = solver.sample(x_t, steps=steps, order=2,
                          skip_type="time_uniform", method="multistep")
    ref = gd.denorm_spec(x.squeeze(1).transpose(1, 2)).numpy()

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    got = sched.denorm_spec(
        sched.sample_unipc_bh2(denoise_fn, x_j, k_step, steps,
                               jnp.asarray(cond), variant="bh1")
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=5e-4)


def test_unipc_vary_coeff_matches_reference():
    """vary_coeff variant parity (uni_pc.py:369-467 varying-coefficient
    predictor/corrector; previously a gated NotImplementedError)."""
    from diffusion.uni_pc import NoiseScheduleVP, UniPC, model_wrapper

    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    k_step, steps = 40, 20
    x_t, x_j = _x_init(gd, sched, spec, k_step)

    ns = NoiseScheduleVP(schedule="discrete", betas=gd.betas[:k_step])
    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    model_fn = model_wrapper(
        gd.denoise_fn, ns, model_type="noise", model_kwargs={"cond": cond_t}
    )
    solver = UniPC(model_fn, ns, variant="vary_coeff")
    with torch.no_grad():
        x = solver.sample(x_t, steps=steps, order=2,
                          skip_type="time_uniform", method="multistep")
    ref = gd.denorm_spec(x.squeeze(1).transpose(1, 2)).numpy()

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    got = sched.denorm_spec(
        sched.sample_unipc_vary(denoise_fn, x_j, k_step, steps,
                                jnp.asarray(cond))
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("order", [2, 3])
def test_dpmpp_adaptive_matches_reference(order):
    """Adaptive step-size DPM-Solver++ (dpm_solver_pytorch.py:953-1013;
    previously a gated NotImplementedError).

    Unlike the fixed-grid samplers, EXACT trajectory parity with the
    vendored solver is unattainable: torch's discrete schedule arrays are
    float64 and type-promote the whole update chain, so its error
    estimate E sits at the float64 rounding floor on a smooth toy
    problem, and the h <- theta*h*E^(-1/order) step law amplifies that
    precision difference into a different (coarser) accepted-step
    sequence. The controller's actual CONTRACT is local error <= delta =
    max(atol, rtol*|x|) per accepted step; this asserts both
    implementations land on the same ODE solution within that band:
    each within 0.05 (on the [-1,1]-normalized spec; a few accepted
    steps x rtol=0.05) of a dense 40-step fixed-grid solve AND of each
    other. Measured gaps: jax 0.003 (order 2) / 0.027 (order 3), torch
    2e-5 — comfortably inside."""
    from diffusion.dpm_solver_pytorch import DPM_Solver, NoiseScheduleVP, model_wrapper

    ref_net, mine, params = _ref_pair()
    gd = _ref_gaussian(ref_net)
    sched = DiffusionSchedule(timesteps=TSTEPS, k_step=TSTEPS)
    spec, cond, _ = _inputs()
    k_step = 40
    x_t, x_j = _x_init(gd, sched, spec, k_step)

    ns = NoiseScheduleVP(schedule="discrete", betas=gd.betas[:k_step])
    cond_t = torch.from_numpy(cond.transpose(0, 2, 1))
    model_fn = model_wrapper(
        gd.denoise_fn, ns, model_type="noise", model_kwargs={"cond": cond_t}
    )
    solver = DPM_Solver(model_fn, ns, algorithm_type="dpmsolver++")
    with torch.no_grad():
        x = solver.sample(x_t, order=order, method="adaptive",
                          solver_type="dpmsolver")
    ref = x.squeeze(1).numpy().transpose(0, 2, 1)

    def denoise_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc)

    dense = np.asarray(sched.sample_dpmpp_singlestep(
        denoise_fn, x_j, k_step, 40, jnp.asarray(cond), order=2
    ))
    got = np.asarray(sched.sample_dpmpp_adaptive(
        denoise_fn, x_j, k_step, jnp.asarray(cond), order=order
    ))
    assert np.abs(got - dense).max() < 0.05, np.abs(got - dense).max()
    assert np.abs(ref - dense).max() < 0.05, np.abs(ref - dense).max()
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()
