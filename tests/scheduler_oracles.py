"""Independent numpy oracles for the inference schedulers.

These are SECOND implementations of the algorithms behind
`latte_tpu/core/scheduler.py`, written deliberately in the imperative,
stateful idiom of the published algorithms (diffusers' counter/list style,
k-diffusion's sigma loops) rather than the repo's functional branchless
style, and computed in fp64 numpy. They never import latte_tpu — trajectory
agreement between the two is therefore evidence of correctness against the
reference's scheduler menu (`/root/reference/sample/sample_t2x.py:43-114`),
not self-agreement of one code base with itself.

DEIS additionally replaces the closed-form log-rho integrals with numerical
quadrature, so the polynomial-extrapolation coefficients are checked by an
entirely different method.

Every oracle consumes:
  x        initial latent (fp64),
  ts       the eval-sequence of training timesteps (descending),
  eps_fn   eps_fn(x_scaled_fp32, t_float) -> eps (fp32 numpy),
  tables   _Tables(num_train_timesteps) with fp64 betas/alphas_cumprod,
  noises   per-model-call unit normals (ancestral/stochastic methods index
           them by call number, matching the jax driver's fold_in(rng, call)).
"""

from __future__ import annotations

import numpy as np


class _Tables:
    """fp64 linear-beta tables (the training schedule both sides share)."""

    def __init__(self, num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02):
        self.num_train_timesteps = num_train_timesteps
        self.betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        self.alphas_cumprod = np.cumprod(1.0 - self.betas)

    def sigmas_for(self, ts):
        """Karras-convention sigma grid for a timestep sequence, terminal 0."""
        ac = self.alphas_cumprod
        sig = np.sqrt((1 - ac[ts]) / ac[ts])
        return np.append(sig, 0.0)


def _eps(eps_fn, x, scale_sigma, t):
    """One model call: scale the input k-diffusion style, cast to fp32."""
    x_in = (x / np.sqrt(scale_sigma**2 + 1)).astype(np.float32)
    return np.asarray(eps_fn(x_in, float(t)), dtype=np.float64)


# ---------------------------------------------------------------------------
# first-order sigma-space methods (k-diffusion sample_euler / _ancestral)
# ---------------------------------------------------------------------------

def euler_trajectory(x, ts, eps_fn, tables):
    sigmas = tables.sigmas_for(ts)
    for i in range(len(ts)):
        sig, sig_next = sigmas[i], sigmas[i + 1]
        eps = _eps(eps_fn, x, sig, ts[i])
        x0 = x - sig * eps
        d = (x - x0) / sig
        x = x + d * (sig_next - sig)
    return x


def euler_ancestral_trajectory(x, ts, eps_fn, tables, noises):
    sigmas = tables.sigmas_for(ts)
    for i in range(len(ts)):
        sig, sig_next = sigmas[i], sigmas[i + 1]
        eps = _eps(eps_fn, x, sig, ts[i])
        x0 = x - sig * eps
        sigma_up = np.sqrt(max(sig_next**2 * (sig**2 - sig_next**2) / sig**2, 0.0))
        sigma_down = np.sqrt(max(sig_next**2 - sigma_up**2, 0.0))
        d = (x - x0) / sig
        x = x + d * (sigma_down - sig) + sigma_up * noises[i]
    return x


# ---------------------------------------------------------------------------
# Heun (diffusers HeunDiscreteScheduler: Euler predictor + trapezoid corrector)
# ---------------------------------------------------------------------------

def heun_trajectory(x, ts, eps_fn, tables):
    sigmas = tables.sigmas_for(ts)
    n = len(ts)
    i = 0
    while i < n:
        sig, sig_next = sigmas[i], sigmas[i + 1]
        dt = sig_next - sig
        eps = _eps(eps_fn, x, sig, ts[i])
        d = (x - (x - sig * eps)) / sig
        if sig_next <= 0:  # last interval: plain Euler, no corrector eval
            x = x + d * dt
            i += 1
            continue
        saved = x
        x = x + d * dt  # predictor to sigma_next
        t_next = ts[i + 1] if i + 1 < n else ts[-1]
        eps2 = _eps(eps_fn, x, sig_next, t_next)
        d2 = (x - (x - sig_next * eps2)) / sig_next
        x = saved + 0.5 * (d + d2) * dt
        i += 1
    return x


# ---------------------------------------------------------------------------
# KDPM2 ancestral (k-diffusion sample_dpm_2_ancestral, diffusers interleave)
# ---------------------------------------------------------------------------

def _sigma_to_t(sigma, tables):
    """k-diffusion piecewise-linear inversion of the log-sigma table."""
    ac = tables.alphas_cumprod
    log_sigmas = np.log(np.sqrt((1 - ac) / ac))
    log_sigma = np.log(max(sigma, 1e-10))
    dists = log_sigma - log_sigmas
    low_idx = int(np.clip((dists >= 0).sum() - 1, 0, len(log_sigmas) - 2))
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0.0, 1.0)
    return (1 - w) * low_idx + w * high_idx


def kdpm2_ancestral_trajectory(x, ts, eps_fn, tables, noises):
    sigmas = tables.sigmas_for(ts)
    n = len(ts)
    call = 0
    for i in range(n):
        sig, sig_next = sigmas[i], sigmas[i + 1]
        sigma_up = np.sqrt(max(sig_next**2 * (sig**2 - sig_next**2) / sig**2, 0.0))
        sigma_down = np.sqrt(max(sig_next**2 - sigma_up**2, 0.0))
        sigma_mid = np.exp(0.5 * (np.log(sig) + np.log(max(sigma_down, 1e-10))))
        eps = _eps(eps_fn, x, sig, ts[i])
        d = (x - (x - sig * eps)) / sig
        if sig_next <= 0:  # terminal: single Euler-ancestral step
            x = x + d * (sigma_down - sig) + sigma_up * noises[call]
            call += 1
            continue
        saved = x
        x = x + d * (sigma_mid - sig)
        call += 1
        t_mid = _sigma_to_t(sigma_mid, tables)
        eps2 = _eps(eps_fn, x, sigma_mid, t_mid)
        d2 = (x - (x - sigma_mid * eps2)) / sigma_mid
        x = saved + d2 * (sigma_down - sig) + sigma_up * noises[call]
        call += 1
    return x


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M) — multistep midpoint in log-SNR space
# ---------------------------------------------------------------------------

def dpm2m_trajectory(x, ts, eps_fn, tables):
    ac = tables.alphas_cumprod[ts]
    alpha = np.append(np.sqrt(ac), 1.0)
    sigma = np.append(np.sqrt(1 - ac), 1e-4)
    lam = np.log(alpha) - np.log(sigma)
    m_prev = None
    for i in range(len(ts)):
        eps = _eps(eps_fn, x, 0.0, ts[i])  # no k-diffusion input scaling
        x0 = (x - np.sqrt(1 - ac[i]) * eps) / np.sqrt(ac[i])
        h = lam[i + 1] - lam[i]
        first = (sigma[i + 1] / sigma[i]) * x - alpha[i + 1] * np.expm1(-h) * x0
        if m_prev is None:
            x = first
        else:
            h_prev = lam[i] - lam[i - 1]
            r = h_prev / h
            d1 = (x0 - m_prev) / r
            x = first - 0.5 * alpha[i + 1] * np.expm1(-h) * d1
        m_prev = x0
    return x


# ---------------------------------------------------------------------------
# DEIS (logrho order 2) with NUMERICAL QUADRATURE of the interpolant
# ---------------------------------------------------------------------------

def deis_trajectory(x, ts, eps_fn, tables, quad_points=200_001):
    ac = tables.alphas_cumprod[ts]
    alpha = np.append(np.sqrt(ac), 1.0)
    sigma = np.append(np.sqrt(1 - ac), 1e-4)
    rho = sigma / alpha
    m_prev = None
    for i in range(len(ts)):
        eps = _eps(eps_fn, x, 0.0, ts[i])
        if m_prev is None:
            # exponential Euler on eps in rho space
            x = alpha[i + 1] * (x / alpha[i] + (rho[i + 1] - rho[i]) * eps)
        else:
            # integrate the log-space linear interpolant of eps through
            # (rho_s1, m_prev), (rho_s0, eps) over [rho_s0, rho_t] by
            # trapezoid quadrature — no closed-form antiderivative used
            r_s0, r_s1, r_t = rho[i], rho_prev, rho[i + 1]
            grid = np.linspace(r_s0, r_t, quad_points)
            b0 = (np.log(grid) - np.log(r_s1)) / (np.log(r_s0) - np.log(r_s1))
            b1 = (np.log(grid) - np.log(r_s0)) / (np.log(r_s1) - np.log(r_s0))
            c0 = np.trapezoid(b0, grid)
            c1 = np.trapezoid(b1, grid)
            x = alpha[i + 1] * (x / alpha[i] + c0 * eps + c1 * m_prev)
        m_prev = eps
        rho_prev = rho[i]
    return x


# ---------------------------------------------------------------------------
# PNDM (diffusers PNDMScheduler: counter + ets list, PRK prologue + PLMS)
# ---------------------------------------------------------------------------

def pndm_trajectory(x, ts, eps_fn, tables, num_steps, skip_prk=False):
    """Imperative replica of diffusers' PNDM step_prk/step_plms dispatch.

    ``ts`` must be the repo scheduler's eval sequence for ``num_steps``
    (PRK prologue entries included); the oracle keys its state machine off
    the call counter exactly as diffusers does.
    """
    ac = tables.alphas_cumprod
    step_ratio = tables.num_train_timesteps // num_steps
    final_ac = ac[0]  # set_alpha_to_one=False

    def prev_sample(sample, t, prev_t, mo):
        a_t = ac[int(np.clip(t, 0, tables.num_train_timesteps - 1))]
        a_prev = (
            ac[int(np.clip(prev_t, 0, tables.num_train_timesteps - 1))]
            if prev_t >= 0
            else final_ac
        )
        coeff = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(1 - a_prev) + np.sqrt(a_t * (1 - a_t) * a_prev)
        return coeff * sample - (a_prev - a_t) * mo / denom

    ets = []
    cur_model_output = 0.0
    cur_sample = None
    n_prk = 0 if skip_prk else 12
    for counter, t in enumerate(ts):
        mo = _eps(eps_fn, x, 0.0, t)
        if counter < n_prk:  # ---- PRK prologue (three RK4 groups) ----
            diff_to_prev = step_ratio // 2 if counter % 2 == 0 else 0
            prev_t = t - diff_to_prev
            t_used = ts[counter // 4 * 4]
            if counter % 4 == 0:
                cur_model_output = cur_model_output + mo / 6
                ets.append(mo)
                cur_sample = x
                used = mo
            elif counter % 4 in (1, 2):
                cur_model_output = cur_model_output + mo / 3
                used = mo
            else:  # counter % 4 == 3
                used = cur_model_output + mo / 6
                cur_model_output = 0.0
            x = prev_sample(cur_sample, t_used, prev_t, used)
        else:  # ---- PLMS body (Adams-Bashforth up to order 4) ----
            if counter != 1:
                ets = ets[-3:] + [mo]
            prev_t, t_used, sample = t - step_ratio, t, x
            if counter == 1:
                prev_t, t_used, sample = t, t + step_ratio, cur_sample
            if len(ets) == 1 and counter == 0:
                used = mo
                cur_sample = x
            elif len(ets) == 1 and counter == 1:
                used = (mo + ets[-1]) / 2
            elif len(ets) == 2:
                used = (3 * ets[-1] - ets[-2]) / 2
            elif len(ets) == 3:
                used = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
            else:
                used = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
            x = prev_sample(sample, t_used, prev_t, used)
    return x


# ---------------------------------------------------------------------------
# DDIM / DDPM (Song et al. / Ho et al. closed forms)
# ---------------------------------------------------------------------------

def ddim_trajectory(x, ts, eps_fn, tables):
    ac = tables.alphas_cumprod
    for i, t in enumerate(ts):
        eps = _eps(eps_fn, x, 0.0, t)
        a_t = ac[t]
        a_prev = ac[ts[i + 1]] if i + 1 < len(ts) else 1.0
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    return x


def ddpm_trajectory(x, ts, eps_fn, tables, noises, clip_sample=True):
    ac = tables.alphas_cumprod
    for i, t in enumerate(ts):
        eps = _eps(eps_fn, x, 0.0, t)
        a_t = ac[t]
        a_prev = ac[ts[i + 1]] if i + 1 < len(ts) else 1.0
        cur_alpha = a_t / a_prev
        cur_beta = 1 - cur_alpha
        x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        if clip_sample:
            x0 = np.clip(x0, -1, 1)
        mean = (
            np.sqrt(a_prev) * cur_beta / (1 - a_t) * x0
            + np.sqrt(cur_alpha) * (1 - a_prev) / (1 - a_t) * x
        )
        var = max((1 - a_prev) / (1 - a_t) * cur_beta, 1e-20)
        x = mean + (np.sqrt(var) * noises[i] if t > 0 else 0.0)
    return x
