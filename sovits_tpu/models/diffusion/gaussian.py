"""Gaussian diffusion: schedule, training loss, and fast samplers.

Equivalent of diffusion/diffusion.py:36-396 plus the actually-used paths of
the vendored DPM-Solver (dpm_solver_pytorch.py: discrete NoiseScheduleVP +
multistep order-2 'dpmsolver' updates, time_uniform) re-derived for XLA:

- the schedule is a host-side numpy table; per-step solver constants
  (alpha/sigma/lambda at the continuous sampling times) are precomputed, so
  each sampler is a single lax.scan whose body is one denoiser eval plus a
  few scalar FMAs — no python in the loop, jits once per (k_step, speedup),
- samplers: ddpm (full chain), ddim, pndm/plms, dpm-solver++ (2M), and
  UniPC (bh2, order 2, predictor-corrector) — all parity-tested against the
  reference including its vendored solver libraries.

Spec normalization: norm = (x - min)/(max - min)*2 - 1 (diffusion.py:392-396).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    timesteps: int = 1000
    k_step: int = 1000
    max_beta: float = 0.02
    spec_min: float = -12.0
    spec_max: float = 2.0

    def __post_init__(self):
        betas = np.linspace(1e-4, self.max_beta, self.timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        object.__setattr__(self, "betas", betas)
        object.__setattr__(self, "alphas_cumprod", alphas_cumprod)
        ac_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = betas * (1.0 - ac_prev) / (1.0 - alphas_cumprod)
        object.__setattr__(self, "posterior_variance", posterior_variance)
        object.__setattr__(
            self,
            "posterior_log_variance",
            np.log(np.maximum(posterior_variance, 1e-20)),
        )
        object.__setattr__(
            self, "posterior_mean_coef1", betas * np.sqrt(ac_prev) / (1.0 - alphas_cumprod)
        )
        object.__setattr__(
            self,
            "posterior_mean_coef2",
            (1.0 - ac_prev) * np.sqrt(1.0 - betas) / (1.0 - alphas_cumprod),
        )

    # -- spec normalization ------------------------------------------------
    def norm_spec(self, x):
        return (x - self.spec_min) / (self.spec_max - self.spec_min) * 2.0 - 1.0

    def denorm_spec(self, x):
        return (x + 1.0) / 2.0 * (self.spec_max - self.spec_min) + self.spec_min

    # -- q / training ------------------------------------------------------
    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        sqrt_ac = jnp.asarray(np.sqrt(self.alphas_cumprod), x_start.dtype)
        sqrt_1m = jnp.asarray(np.sqrt(1.0 - self.alphas_cumprod), x_start.dtype)
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        return sqrt_ac[t].reshape(shape) * x_start + sqrt_1m[t].reshape(shape) * noise

    def p_losses(self, denoise_fn, x_start, t, cond, noise) -> jax.Array:
        """Noise-prediction MSE (diffusion.py:210-223)."""
        x_noisy = self.q_sample(x_start, t, noise)
        pred = denoise_fn(x_noisy, t, cond)
        return jnp.mean((noise.astype(jnp.float32) - pred.astype(jnp.float32)) ** 2)

    # -- continuous-time helpers (discrete NoiseScheduleVP) -----------------
    def _log_alpha(self, t_cont: np.ndarray, n: int) -> np.ndarray:
        """Interpolated log(alpha_t) over the first n betas (dpm_solver:95-131)."""
        log_alphas = 0.5 * np.cumsum(np.log(1.0 - self.betas[:n]))
        t_array = np.linspace(0.0, 1.0, n + 1)[1:]
        return np.interp(t_cont, t_array, log_alphas)

    def solver_times(self, t: int, steps: int) -> dict[str, np.ndarray]:
        """Precompute alpha/sigma/lambda/model-input-time on the uniform grid."""
        n = t
        t_cont = np.linspace(1.0, 1.0 / n, steps + 1)
        log_alpha = self._log_alpha(t_cont, n)
        alpha = np.exp(log_alpha)
        sigma = np.sqrt(1.0 - np.exp(2.0 * log_alpha))
        lam = log_alpha - np.log(sigma)
        t_input = (t_cont - 1.0 / n) * n  # model input time in [0, n-1]
        return {
            "alpha": alpha.astype(np.float32),
            "sigma": sigma.astype(np.float32),
            "lambda": lam.astype(np.float32),
            "t_input": t_input.astype(np.float32),
        }

    # -- samplers ------------------------------------------------------------
    def sample_ddpm(self, denoise_fn, x, t_start: int, cond, rng) -> jax.Array:
        """Full ancestral chain (diffusion.py:157-164), t_start steps."""
        sqrt_recip = jnp.asarray(np.sqrt(1.0 / self.alphas_cumprod), jnp.float32)
        sqrt_recipm1 = jnp.asarray(np.sqrt(1.0 / self.alphas_cumprod - 1.0), jnp.float32)
        coef1 = jnp.asarray(self.posterior_mean_coef1, jnp.float32)
        coef2 = jnp.asarray(self.posterior_mean_coef2, jnp.float32)
        log_var = jnp.asarray(self.posterior_log_variance, jnp.float32)
        b = x.shape[0]

        def body(carry, i):
            x, rng = carry
            t = jnp.full((b,), i, jnp.int32)
            eps = denoise_fn(x, t.astype(jnp.float32), cond)
            x0 = sqrt_recip[i] * x - sqrt_recipm1[i] * eps
            x0 = jnp.clip(x0, -1.0, 1.0)
            mean = coef1[i] * x0 + coef2[i] * x
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, x.shape)
            x = mean + jnp.where(i > 0, 1.0, 0.0) * jnp.exp(0.5 * log_var[i]) * noise
            return (x, rng), None

        (x, _), _ = jax.lax.scan(
            body, (x, rng), jnp.arange(t_start - 1, -1, -1)
        )
        return x

    def sample_ddim(self, denoise_fn, x, t_start: int, speedup: int, cond) -> jax.Array:
        """DDIM with stride `speedup` (diffusion.py:145-155)."""
        ts = np.array(list(reversed(range(0, t_start, speedup))), np.int32)
        ac = jnp.asarray(self.alphas_cumprod, jnp.float32)
        b = x.shape[0]

        def body(x, i):
            a_t = ac[i]
            a_prev = ac[jnp.maximum(i - speedup, 0)]
            eps = denoise_fn(x, jnp.full((b,), i, jnp.float32), cond)
            x_prev = jnp.sqrt(a_prev) * (
                x / jnp.sqrt(a_t)
                + (jnp.sqrt((1 - a_prev) / a_prev) - jnp.sqrt((1 - a_t) / a_t)) * eps
            )
            return x_prev, None

        x, _ = jax.lax.scan(body, x, jnp.asarray(ts))
        return x

    def sample_plms(self, denoise_fn, x, t_start: int, speedup: int, cond) -> jax.Array:
        """PLMS/PNDM (diffusion.py:167-201): Adams-Bashforth on noise preds."""
        ts = list(reversed(range(0, t_start, speedup)))
        ac = jnp.asarray(self.alphas_cumprod, jnp.float32)
        b = x.shape[0]

        def x_pred(x, noise_t, i):
            a_t = ac[i]
            a_prev = ac[jnp.maximum(i - speedup, 0)]
            a_sq, ap_sq = jnp.sqrt(a_t), jnp.sqrt(a_prev)
            x_delta = (a_prev - a_t) * (
                (1.0 / (a_sq * (a_sq + ap_sq))) * x
                - 1.0
                / (a_sq * (jnp.sqrt((1 - a_prev) * a_t) + jnp.sqrt((1 - a_t) * a_prev)))
                * noise_t
            )
            return x + x_delta

        def eval_eps(x, i):
            return denoise_fn(x, jnp.full((b,), i, jnp.float32), cond)

        hist = []
        for k, i in enumerate(ts[:3]):
            eps = eval_eps(x, jnp.int32(i))
            if k == 0:
                xp = x_pred(x, eps, jnp.int32(i))
                eps_prev = eval_eps(xp, jnp.int32(max(i - speedup, 0)))
                eps_prime = (eps + eps_prev) / 2
            elif k == 1:
                eps_prime = (3 * eps - hist[-1]) / 2
            else:
                eps_prime = (23 * eps - 16 * hist[-1] + 5 * hist[-2]) / 12
            x = x_pred(x, eps_prime, jnp.int32(i))
            hist.append(eps)
        if len(ts) <= 3:
            return x

        h = jnp.stack(hist[-3:][::-1])  # [e_{t-1}, e_{t-2}, e_{t-3}]

        def body(carry, i):
            x, h = carry
            eps = eval_eps(x, i)
            eps_prime = (55 * eps - 59 * h[0] + 37 * h[1] - 9 * h[2]) / 24
            x = x_pred(x, eps_prime, i)
            h = jnp.stack([eps, h[0], h[1]])
            return (x, h), None

        (x, _), _ = jax.lax.scan(body, (x, h), jnp.asarray(ts[3:], jnp.int32))
        return x

    def sample_dpmpp_2m(self, denoise_fn, x, t_start: int, steps: int, cond) -> jax.Array:
        """Multistep DPM-Solver++ order 2, time_uniform, solver_type=dpmsolver.

        Matches DPM_Solver.sample(..., order=2, skip_type='time_uniform',
        method='multistep') over NoiseScheduleVP('discrete', betas[:t_start])
        — the reference's default sampler (diffusion.py:257-303).
        """
        tbl = self.solver_times(t_start, steps)
        alpha = jnp.asarray(tbl["alpha"])
        sigma = jnp.asarray(tbl["sigma"])
        lam = jnp.asarray(tbl["lambda"])
        t_input = jnp.asarray(tbl["t_input"])
        b = x.shape[0]
        lower_order_final = steps < 10

        def x0_fn(x, idx):
            eps = denoise_fn(x, jnp.full((b,), t_input[idx], jnp.float32), cond)
            return (x - sigma[idx] * eps) / alpha[idx]

        def first_update(x, x0_prev, i):
            # order-1 (DDIM-like) from grid index i-1 to i
            h = lam[i] - lam[i - 1]
            phi_1 = jnp.expm1(-h)
            return sigma[i] / sigma[i - 1] * x - alpha[i] * phi_1 * x0_prev

        # step 0: model at t_T
        m_prev = x0_fn(x, 0)
        # step 1: order-1 update
        x = first_update(x, m_prev, 1)
        m_cur = x0_fn(x, 1)

        def second_update(x, m0, m1, i):
            # m0 = model at i-1 (latest), m1 = model at i-2
            h0 = lam[i - 1] - lam[i - 2]
            h = lam[i] - lam[i - 1]
            r0 = h0 / h
            d1 = (m0 - m1) / r0
            phi_1 = jnp.expm1(-h)
            return (
                sigma[i] / sigma[i - 1] * x
                - alpha[i] * phi_1 * m0
                - 0.5 * alpha[i] * phi_1 * d1
            )

        if lower_order_final:
            # python loop (steps < 10): final step drops to order 1
            m1, m0 = m_prev, m_cur
            for step in range(2, steps + 1):
                order = min(2, steps + 1 - step)
                if order == 2:
                    x = second_update(x, m0, m1, step)
                else:
                    x = first_update(x, m0, step)
                if step < steps:
                    m1, m0 = m0, x0_fn(x, step)
            return x

        def body(carry, step):
            x, m0, m1 = carry
            x = second_update(x, m0, m1, step)
            m_new = x0_fn(x, step)
            return (x, m_new, m0), None

        (x, m0, m1), _ = jax.lax.scan(
            body, (x, m_cur, m_prev), jnp.arange(2, steps, dtype=jnp.int32)
        )
        # final step (step == steps): order 2, no further model eval
        x = second_update(x, m0, m1, steps)
        return x

    def sample_dpmpp_singlestep(
        self, denoise_fn, x, t_start: int, steps: int, cond, order: int = 2
    ) -> jax.Array:
        """Singlestep DPM-Solver++ (orders 1-3, time_uniform, data pred).

        Matches DPM_Solver.sample(..., method='singlestep', order=order,
        skip_type='time_uniform', solver_type='dpmsolver') — the vendored
        breadth beyond the reference's default multistep path
        (diffusion/dpm_solver_pytorch.py:335-1253). The uniform time grid
        makes every inner point (r1=1/2 midpoints, r2=2/3 thirds) land on
        the fine `solver_times` grid, so one table serves all blocks.
        """
        assert order in (1, 2, 3)
        tbl = self.solver_times(t_start, steps)
        alpha = jnp.asarray(tbl["alpha"])
        sigma = jnp.asarray(tbl["sigma"])
        lam = jnp.asarray(tbl["lambda"])
        t_input = jnp.asarray(tbl["t_input"])
        b_sz = x.shape[0]

        def x0_fn(x, idx):
            eps = denoise_fn(x, jnp.full((b_sz,), t_input[idx], jnp.float32), cond)
            return (x - sigma[idx] * eps) / alpha[idx]

        # block order plan (dpm_solver_pytorch.py:
        # get_orders_and_timesteps_for_singlestep_solver)
        if order == 1:
            orders = [1] * steps
        elif order == 2:
            orders = [2] * (steps // 2) + ([1] if steps % 2 else [])
        else:
            if steps % 3 == 0:
                orders = [3] * (steps // 3 - 1) + [2, 1]
            elif steps % 3 == 1:
                orders = [3] * (steps // 3) + [1]
            else:
                orders = [3] * (steps // 3) + [2]

        def update_1(x, s, t):
            h = lam[t] - lam[s]
            m_s = x0_fn(x, s)
            return sigma[t] / sigma[s] * x - alpha[t] * jnp.expm1(-h) * m_s

        def update_2(x, s, t):
            s1 = (s + t) // 2  # time-uniform midpoint is on the fine grid
            h = lam[t] - lam[s]
            r1 = (lam[s1] - lam[s]) / h
            m_s = x0_fn(x, s)
            x_s1 = sigma[s1] / sigma[s] * x - alpha[s1] * jnp.expm1(-r1 * h) * m_s
            m_s1 = x0_fn(x_s1, s1)
            phi_1 = jnp.expm1(-h)
            return (
                sigma[t] / sigma[s] * x
                - alpha[t] * phi_1 * m_s
                - (0.5 / r1) * alpha[t] * phi_1 * (m_s1 - m_s)
            )

        def update_3(x, s, t):
            s1 = s + (t - s) // 3
            s2 = s + 2 * (t - s) // 3
            h = lam[t] - lam[s]
            r1 = (lam[s1] - lam[s]) / h
            r2 = (lam[s2] - lam[s]) / h
            m_s = x0_fn(x, s)
            x_s1 = sigma[s1] / sigma[s] * x - alpha[s1] * jnp.expm1(-r1 * h) * m_s
            m_s1 = x0_fn(x_s1, s1)
            phi_12 = jnp.expm1(-r2 * h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            x_s2 = (
                sigma[s2] / sigma[s] * x
                - alpha[s2] * phi_12 * m_s
                + (r2 / r1) * alpha[s2] * phi_22 * (m_s1 - m_s)
            )
            m_s2 = x0_fn(x_s2, s2)
            phi_1 = jnp.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            return (
                sigma[t] / sigma[s] * x
                - alpha[t] * phi_1 * m_s
                + (1.0 / r2) * alpha[t] * phi_2 * (m_s2 - m_s)
            )

        update = {1: update_1, 2: update_2, 3: update_3}
        # uniform prefix runs as a scan; the (at most two) tail blocks are
        # unrolled — avoids Python-unrolling long chains at big step counts
        n_pre = 0
        while n_pre < len(orders) and orders[n_pre] == order:
            n_pre += 1
        if n_pre > 1:
            def body(x, i):
                return update[order](x, i * order, (i + 1) * order), None
            x, _ = jax.lax.scan(body, x, jnp.arange(n_pre, dtype=jnp.int32))
            pos = n_pre * order
        else:
            pos = 0
            if n_pre == 1:
                x = update[order](x, 0, order)
                pos = order
        for o in orders[n_pre:]:
            x = update[o](x, pos, pos + o)
            pos += o
        return x

    def sample_unipc_bh2(self, denoise_fn, x, t_start: int, steps: int, cond,
                         variant: str = "bh2") -> jax.Array:
        """Multistep UniPC (variants bh1/bh2, order 2, data prediction).

        Matches UniPC.sample(..., order=2, skip_type='time_uniform',
        method='multistep') over NoiseScheduleVP('discrete', betas[:t])
        (diffusion/uni_pc.py:473-592): order-2 predictor with rho=1/2 plus a
        B(h) corrector; last step drops to order 1 without corrector.
        Variant sets B(h): expm1(h) for bh2, h for bh1 (uni_pc.py:238+).
        """
        tbl = self.solver_times(t_start, steps)
        alpha = jnp.asarray(tbl["alpha"])
        sigma = jnp.asarray(tbl["sigma"])
        lam = jnp.asarray(tbl["lambda"])
        t_input = jnp.asarray(tbl["t_input"])
        b_sz = x.shape[0]

        def x0_fn(x, idx):
            eps = denoise_fn(x, jnp.full((b_sz,), t_input[idx], jnp.float32), cond)
            return (x - sigma[idx] * eps) / alpha[idx]

        def coeffs(i):
            """Per-step (h_phi_1, B_h, b1, b2) with hh = -h (predict_x0)."""
            hh = -(lam[i] - lam[i - 1])
            h_phi_1 = jnp.expm1(hh)
            b_h = jnp.expm1(hh) if variant == "bh2" else hh  # B(h)
            h_phi_k1 = h_phi_1 / hh - 1.0
            b1 = h_phi_k1 / b_h
            h_phi_k2 = h_phi_k1 / hh - 0.5
            b2 = h_phi_k2 * 2.0 / b_h
            return h_phi_1, b_h, b1, b2

        def base(x, m_prev, i, h_phi_1):
            return sigma[i] / sigma[i - 1] * x - alpha[i] * h_phi_1 * m_prev

        # step 0: model at t_T
        m0 = x0_fn(x, 0)
        # step 1: order-1 with corrector (uni_pc.py order==1 path)
        h_phi_1, b_h, b1, _ = coeffs(1)
        x_t_ = base(x, m0, 1, h_phi_1)
        m_t = x0_fn(x_t_, 1)
        x = x_t_ - alpha[1] * b_h * 0.5 * (m_t - m0)
        m1, m0 = m0, m_t  # m0 = latest (at grid 1), m1 = at grid 0

        def order2_update(x, m0, m1, i, use_corrector: bool):
            h = lam[i] - lam[i - 1]
            rk = (lam[i - 2] - lam[i - 1]) / h
            d1 = (m1 - m0) / rk
            h_phi_1, b_h, b1, b2 = coeffs(i)
            x_t_ = base(x, m0, i, h_phi_1)
            x_pred = x_t_ - alpha[i] * b_h * 0.5 * d1
            if not use_corrector:
                return x_pred, None
            m_t = x0_fn(x_pred, i)
            # rhos_c = solve([[1, 1], [rk, 1]], [b1, b2])
            rho2 = (b2 - rk * b1) / (1.0 - rk)
            rho1 = b1 - rho2
            x_t = x_t_ - alpha[i] * b_h * (rho1 * d1 + rho2 * (m_t - m0))
            return x_t, m_t

        if steps >= 3:
            def body(carry, i):
                x, m0, m1 = carry
                x, m_t = order2_update(x, m0, m1, i, use_corrector=True)
                return (x, m_t, m0), None

            (x, m0, m1), _ = jax.lax.scan(
                body, (x, m0, m1), jnp.arange(2, steps, dtype=jnp.int32)
            )
        # final step: order 1, no corrector (uni_pc.py:592+ last-step rule)
        h_phi_1, _, _, _ = coeffs(steps)
        x = base(x, m0, steps, h_phi_1)
        return x

    def sample_unipc_vary(self, denoise_fn, x, t_start: int, steps: int,
                          cond) -> jax.Array:
        """Multistep UniPC variant='vary_coeff' (order 2, data prediction).

        Matches UniPC(variant='vary_coeff').sample(..., order=2,
        skip_type='time_uniform', method='multistep')
        (diffusion/uni_pc.py:369-467 multistep_uni_pc_vary_update): the
        varying-coefficient predictor/corrector solves the K x K Vandermonde
        system C rho = e_k per step instead of the fixed B(h) weights. For
        order 2 the inverses collapse to closed form: A_p = [[1]] and the
        corrector row A_c[0] = [1, -rk] / (1 - rk). The warm-up step is the
        K=1 system (corrector weight phi_2), and the last step drops to
        order 1 without corrector, exactly as the vendored sampler.
        """
        # the reference asserts steps >= order (uni_pc.py sample()); with
        # steps == 1 the K=1 warm-up below would land at index 1 and the
        # final order-1 base step would re-apply the same transition
        assert steps >= 2, f"unipc-vary needs steps >= 2, got {steps}"
        tbl = self.solver_times(t_start, steps)
        alpha = jnp.asarray(tbl["alpha"])
        sigma = jnp.asarray(tbl["sigma"])
        lam = jnp.asarray(tbl["lambda"])
        t_input = jnp.asarray(tbl["t_input"])
        b_sz = x.shape[0]

        def x0_fn(x, idx):
            eps = denoise_fn(x, jnp.full((b_sz,), t_input[idx], jnp.float32), cond)
            return (x - sigma[idx] * eps) / alpha[idx]

        def phis(i):
            """h_phi_1..3 with hh = -h (predict_x0), uni_pc.py:426-434."""
            hh = -(lam[i] - lam[i - 1])
            phi1 = jnp.expm1(hh)
            phi2 = phi1 / hh - 1.0
            phi3 = phi2 / hh - 0.5
            return phi1, phi2, phi3

        def base(x, m_prev, i, phi1):
            return sigma[i] / sigma[i - 1] * x - alpha[i] * phi1 * m_prev

        # step 0: model at t_T; step 1: K=1 vary update WITH corrector
        m0 = x0_fn(x, 0)
        phi1, phi2, _ = phis(1)
        x_t_ = base(x, m0, 1, phi1)
        m_t = x0_fn(x_t_, 1)  # predictor == x_t_ (no D1s at K=1)
        x = x_t_ - alpha[1] * phi2 * (m_t - m0)
        m1, m0 = m0, m_t

        def order2_update(x, m0, m1, i):
            h = lam[i] - lam[i - 1]
            rk = (lam[i - 2] - lam[i - 1]) / h
            d1 = (m1 - m0) / rk
            phi1, phi2, phi3 = phis(i)
            x_t_ = base(x, m0, i, phi1)
            x_pred = x_t_ - alpha[i] * phi2 * d1  # A_p = [[1]]
            m_t = x0_fn(x_pred, i)
            # corrector row A_c[0] of inv([[1, rk/2], [1, 1/2]])
            a_d1 = 1.0 / (1.0 - rk)
            a_dt = -rk / (1.0 - rk)
            x_t = x_t_ - alpha[i] * phi2 * (a_d1 * d1) \
                - alpha[i] * phi3 * ((m_t - m0) * a_dt)
            return x_t, m_t

        if steps >= 3:
            def body(carry, i):
                x, m0, m1 = carry
                x, m_t = order2_update(x, m0, m1, i)
                return (x, m_t, m0), None

            (x, m0, m1), _ = jax.lax.scan(
                body, (x, m0, m1), jnp.arange(2, steps, dtype=jnp.int32)
            )
        phi1, _, _ = phis(steps)
        return base(x, m0, steps, phi1)

    def sample_dpmpp_adaptive(
        self, denoise_fn, x, t_start: int, cond, order: int = 2,
        h_init: float = 0.05, atol: float = 0.0078, rtol: float = 0.05,
        theta: float = 0.9, t_err: float = 1e-5, max_iters: int = 200,
        return_info: bool = False,
    ) -> jax.Array:
        """Adaptive step-size singlestep DPM-Solver++ (orders 2/3).

        Matches DPM_Solver(algorithm_type='dpmsolver++').sample(...,
        method='adaptive', order=order, solver_type='dpmsolver')
        (diffusion/dpm_solver_pytorch.py:953-1013): embedded lower/higher
        singlestep pair, per-element tolerance delta = max(atol,
        rtol*max(|x_lo|,|x_prev|)), RMS-over-batch error control with
        acceptance E <= 1, and step law h <- min(theta*h*E^(-1/order),
        lambda_0 - lambda_s). The data-dependent trip count runs as a
        lax.while_loop — the TPU-idiomatic form of the reference's Python
        while — with a `max_iters` safety bound (the reference relies on
        h being clamped to land exactly on lambda_0).
        """
        assert order in (2, 3)
        n = t_start
        b_sz = x.shape[0]
        # continuous-time discrete-schedule tables (NoiseScheduleVP, jnp
        # mirrors of solver_times' numpy helpers; lambda DECREASES with t)
        t_grid = jnp.asarray(np.linspace(0.0, 1.0, n + 1)[1:], jnp.float32)
        la_np = 0.5 * np.cumsum(np.log(1.0 - self.betas[:n]))
        la_grid = jnp.asarray(la_np, jnp.float32)
        lam_np = la_np - 0.5 * np.log(-np.expm1(2.0 * la_np))
        lam_grid = jnp.asarray(lam_np, jnp.float32)

        def log_alpha(t):
            return jnp.interp(t, t_grid, la_grid)

        def marginal(t):
            la = log_alpha(t)
            alpha = jnp.exp(la)
            sigma = jnp.sqrt(-jnp.expm1(2.0 * la))
            return alpha, sigma

        def lam(t):
            la = log_alpha(t)
            return la - 0.5 * jnp.log(-jnp.expm1(2.0 * la))

        def inv_lambda(l):
            # lam_grid decreases with t: flip for jnp.interp
            return jnp.interp(l, lam_grid[::-1], t_grid[::-1])

        def x0_fn(x, t):
            t_in = jnp.full((b_sz,), (t - 1.0 / n) * n, jnp.float32)
            eps = denoise_fn(x, t_in, cond)
            _, sigma = marginal(t)
            return (x - sigma * eps) / jnp.exp(log_alpha(t))

        def update_1(x, s, t, m_s):
            h = lam(t) - lam(s)
            a_t, sg_t = marginal(t)
            _, sg_s = marginal(s)
            return sg_t / sg_s * x - a_t * jnp.expm1(-h) * m_s

        def update_2(x, s, t, m_s, r1):
            h = lam(t) - lam(s)
            s1 = inv_lambda(lam(s) + r1 * h)
            a_s1, sg_s1 = marginal(s1)
            a_t, sg_t = marginal(t)
            _, sg_s = marginal(s)
            x_s1 = sg_s1 / sg_s * x - a_s1 * jnp.expm1(-r1 * h) * m_s
            m_s1 = x0_fn(x_s1, s1)
            phi_1 = jnp.expm1(-h)
            x_t = (sg_t / sg_s * x - a_t * phi_1 * m_s
                   - (0.5 / r1) * a_t * phi_1 * (m_s1 - m_s))
            return x_t, m_s1

        def update_3(x, s, t, m_s, m_s1, r1, r2):
            h = lam(t) - lam(s)
            s2 = inv_lambda(lam(s) + r2 * h)
            a_s2, sg_s2 = marginal(s2)
            a_t, sg_t = marginal(t)
            _, sg_s = marginal(s)
            phi_12 = jnp.expm1(-r2 * h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            x_s2 = (sg_s2 / sg_s * x - a_s2 * phi_12 * m_s
                    + (r2 / r1) * a_s2 * phi_22 * (m_s1 - m_s))
            m_s2 = x0_fn(x_s2, s2)
            phi_1 = jnp.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            return (sg_t / sg_s * x - a_t * phi_1 * m_s
                    + (1.0 / r2) * a_t * phi_2 * (m_s2 - m_s))

        t_0 = 1.0 / n
        lambda_0 = lam(jnp.float32(t_0))

        def pair(x, s, t):
            """(x_lower, x_higher) with the reference's model-eval reuse."""
            m_s = x0_fn(x, s)
            if order == 2:
                x_lo = update_1(x, s, t, m_s)
                x_hi, _ = update_2(x, s, t, m_s, r1=0.5)
            else:
                x_lo, m_s1 = update_2(x, s, t, m_s, r1=1.0 / 3.0)
                x_hi = update_3(x, s, t, m_s, m_s1, r1=1.0 / 3.0, r2=2.0 / 3.0)
            return x_lo, x_hi

        def cond_fn(carry):
            _x, _xp, s, _h, _ls, it = carry
            return jnp.logical_and(jnp.abs(s - t_0) > t_err, it < max_iters)

        def body_fn(carry):
            x, x_prev, s, h, lambda_s, it = carry
            t = inv_lambda(lambda_s + h)
            x_lo, x_hi = pair(x, s, t)
            delta = jnp.maximum(
                atol, rtol * jnp.maximum(jnp.abs(x_lo), jnp.abs(x_prev))
            )
            err = (x_hi - x_lo) / delta
            e = jnp.max(jnp.sqrt(jnp.mean(
                jnp.square(err.reshape(b_sz, -1)), axis=-1)))
            accept = e <= 1.0
            x = jnp.where(accept, x_hi, x)
            x_prev = jnp.where(accept, x_lo, x_prev)
            s = jnp.where(accept, t, s)
            lambda_s = jnp.where(accept, lam(t), lambda_s)
            h = jnp.minimum(
                theta * h * e ** (-1.0 / order), lambda_0 - lambda_s
            )
            return (x, x_prev, s, h, lambda_s, it + 1)

        s0 = jnp.float32(1.0)
        carry = (x, x, s0, jnp.float32(h_init), lam(s0), jnp.int32(0))
        x, _xp, s, *_ = jax.lax.while_loop(cond_fn, body_fn, carry)
        # Surface a max_iters exit (diverged model, or a too-hard tolerance)
        # instead of silently returning a mid-trajectory x at the wrong s:
        # the reference's python-while always lands on lambda_0 or raises.
        converged = jnp.abs(s - t_0) <= t_err
        jax.lax.cond(
            converged,
            lambda: None,
            lambda: jax.debug.print(
                "sample_dpmpp_adaptive: max_iters exit before t_0 "
                "(s={s}, t_0={t}) - result is mid-trajectory", s=s, t=t_0
            ),
        )
        if return_info:
            return x, converged
        return x

    # -- top-level dispatch --------------------------------------------------
    def sample(
        self,
        denoise_fn,
        cond: jax.Array,  # [B, T, H]
        out_dims: int,
        gt_spec: jax.Array | None,
        k_step: int,
        speedup: int,
        method: str,
        rng: jax.Array,
    ) -> jax.Array:
        """Inference path of GaussianDiffusion.forward (diffusion.py:244-390)."""
        b, t_frames, _ = cond.shape
        if gt_spec is None:
            t_start = self.k_step
            x = jax.random.normal(rng, (b, t_frames, out_dims))
        else:
            t_start = k_step
            norm = self.norm_spec(gt_spec)
            noise = jax.random.normal(rng, norm.shape)
            x = self.q_sample(norm, jnp.full((b,), t_start - 1, jnp.int32), noise)

        if method is None or speedup <= 1:
            x = self.sample_ddpm(denoise_fn, x, t_start, cond, jax.random.fold_in(rng, 1))
        elif method in ("dpm-solver", "dpm-solver++"):
            x = self.sample_dpmpp_2m(denoise_fn, x, t_start, t_start // speedup, cond)
        elif method in ("dpm-solver++-1s", "dpm-solver++-2s", "dpm-solver++-3s"):
            x = self.sample_dpmpp_singlestep(
                denoise_fn, x, t_start, t_start // speedup, cond,
                order=int(method[-2]),
            )
        elif method in ("unipc", "unipc-bh2", "unipc-bh1"):
            x = self.sample_unipc_bh2(
                denoise_fn, x, t_start, t_start // speedup, cond,
                variant="bh1" if method.endswith("bh1") else "bh2",
            )
        elif method == "unipc-vary":
            x = self.sample_unipc_vary(
                denoise_fn, x, t_start, t_start // speedup, cond
            )
        elif method in ("dpm-solver++-adaptive", "dpm-solver++-adaptive-3"):
            x = self.sample_dpmpp_adaptive(
                denoise_fn, x, t_start, cond,
                order=3 if method.endswith("-3") else 2,
            )
        elif method == "pndm":
            x = self.sample_plms(denoise_fn, x, t_start, speedup, cond)
        elif method == "ddim":
            x = self.sample_ddim(denoise_fn, x, t_start, speedup, cond)
        else:
            raise NotImplementedError(method)
        return self.denorm_spec(x)
