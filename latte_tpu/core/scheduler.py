"""Pluggable inference schedulers for the T2V pipeline.

The reference lets users pick one of 10 diffusers schedulers
(`/root/reference/sample/sample_t2x.py:43-114`). This module provides a
functional, scan-friendly re-design of the same roles: each scheduler is a
stateless object whose per-step state (for multistep methods) is an
explicit pytree threaded through `step`, so the whole sampling loop can
live inside one jitted program.

Implemented: DDIM, DDPM, EulerDiscrete, EulerAncestralDiscrete,
HeunDiscrete (2nd-order predictor/corrector), DPMSolverMultistep
(DPM-Solver++ 2M), DPMSolverSinglestep (DPM-Solver++ 2S), DEISMultistep
(true DEIS logrho order-2 exponential integrator), PNDM (true PRK
prologue + 4th-order PLMS body), KDPM2AncestralDiscrete (2nd-order
ancestral midpoint).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.core.schedules import get_named_beta_schedule

__all__ = ["get_scheduler", "SCHEDULERS"]


def _to_f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class BaseScheduler:
    """Shared alpha/sigma tables (fp64 numpy, jit constants)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    prediction_type: str = "epsilon"
    # two model evals per grid interval (predictor/corrector at the SAME
    # index) — drivers repeat the index until state["in_correction"] clears
    interleaved: bool = False

    def __post_init__(self):
        if self.beta_schedule == "linear":
            betas = np.linspace(
                self.beta_start, self.beta_end, self.num_train_timesteps, dtype=np.float64
            )
        elif self.beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    self.beta_start**0.5,
                    self.beta_end**0.5,
                    self.num_train_timesteps,
                    dtype=np.float64,
                )
                ** 2
            )
        else:
            betas = get_named_beta_schedule(self.beta_schedule, self.num_train_timesteps)
        object.__setattr__(self, "betas", betas)
        object.__setattr__(self, "alphas_cumprod", np.cumprod(1.0 - betas))

    # -- common API ------------------------------------------------------
    def init_noise_sigma_for(self, num_inference_steps: int) -> float:
        """Scale applied to the initial x_T draw (diffusers
        ``init_noise_sigma``, a function of the actual step count)."""
        return 1.0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending training-timestep indices (leading-space style)."""
        step = self.num_train_timesteps // num_inference_steps
        return (np.arange(num_inference_steps) * step).round()[::-1].astype(np.int64)

    def scale_model_input(self, sample: jnp.ndarray, t_index: jnp.ndarray, state) -> jnp.ndarray:
        return sample

    def model_timestep(self, i, ts, state) -> jnp.ndarray:
        """Training timestep to condition the model on for call ``i``.

        Interleaved 2nd-order schedulers override this: the corrector
        evaluation sits at a LATER sigma than ts[i] (Heun: the next grid
        point; KDPM2Ancestral: the log-space midpoint), so conditioning
        on ts[i] would mis-time every second model call. May return a
        fractional timestep (the sinusoidal embedding is continuous)."""
        return ts[i].astype(jnp.float32)

    def init_state(self, num_inference_steps: int, shape) -> Dict[str, Any]:
        return {}

    def _pred_x0(self, model_output, sample, alpha_bar):
        if self.prediction_type == "epsilon":
            return (sample - jnp.sqrt(1 - alpha_bar) * model_output) / jnp.sqrt(alpha_bar)
        if self.prediction_type == "sample":
            return model_output
        if self.prediction_type == "v_prediction":
            return jnp.sqrt(alpha_bar) * sample - jnp.sqrt(1 - alpha_bar) * model_output
        raise NotImplementedError(self.prediction_type)

    def _pred_eps(self, model_output, sample, alpha_bar):
        if self.prediction_type == "epsilon":
            return model_output
        x0 = self._pred_x0(model_output, sample, alpha_bar)
        return (sample - jnp.sqrt(alpha_bar) * x0) / jnp.sqrt(1 - alpha_bar)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler(BaseScheduler):
    clip_sample: bool = False
    eta: float = 0.0

    def step(self, model_output, i, ts, sample, state, rng=None):
        t = ts[i]
        prev_t = jnp.where(
            i + 1 < ts.shape[0], ts[jnp.minimum(i + 1, ts.shape[0] - 1)], -1
        )
        ac = _to_f32(self.alphas_cumprod)
        alpha_bar = ac[t]
        alpha_prev = jnp.where(prev_t >= 0, ac[jnp.maximum(prev_t, 0)], 1.0)
        x0 = self._pred_x0(model_output, sample, alpha_bar)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1, 1)
        eps = self._pred_eps(model_output, sample, alpha_bar)
        sigma = self.eta * jnp.sqrt(
            (1 - alpha_prev) / (1 - alpha_bar) * (1 - alpha_bar / alpha_prev)
        )
        prev = jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1 - alpha_prev - sigma**2) * eps
        if self.eta > 0 and rng is not None:
            prev = prev + sigma * jax.random.normal(rng, sample.shape, sample.dtype)
        return prev, state


@dataclasses.dataclass(frozen=True)
class DDPMScheduler(BaseScheduler):
    clip_sample: bool = True
    variance_type: str = "fixed_small"

    def step(self, model_output, i, ts, sample, state, rng=None):
        t = ts[i]
        prev_t = jnp.where(
            i + 1 < ts.shape[0], ts[jnp.minimum(i + 1, ts.shape[0] - 1)], -1
        )
        ac = _to_f32(self.alphas_cumprod)
        alpha_bar = ac[t]
        alpha_prev = jnp.where(prev_t >= 0, ac[jnp.maximum(prev_t, 0)], 1.0)
        cur_alpha = alpha_bar / alpha_prev
        cur_beta = 1 - cur_alpha
        x0 = self._pred_x0(model_output, sample, alpha_bar)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1, 1)
        coef_x0 = jnp.sqrt(alpha_prev) * cur_beta / (1 - alpha_bar)
        coef_xt = jnp.sqrt(cur_alpha) * (1 - alpha_prev) / (1 - alpha_bar)
        mean = coef_x0 * x0 + coef_xt * sample
        if self.variance_type == "fixed_small":
            var = jnp.clip((1 - alpha_prev) / (1 - alpha_bar) * cur_beta, min=1e-20)
        elif self.variance_type == "fixed_large":
            # diffusers fixed_large: the forward beta_t itself
            var = jnp.clip(cur_beta, min=1e-20)
        else:
            raise NotImplementedError(
                f"variance_type {self.variance_type!r}: only fixed_small / "
                "fixed_large (learned variances flow through the iDDPM "
                "engine in core/diffusion.py, not this scheduler)"
            )
        if rng is not None:
            noise = jax.random.normal(rng, sample.shape, sample.dtype)
        else:
            noise = jnp.zeros_like(sample)
        prev = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return prev, state


class _KarrasMixin:
    """sigma-space machinery shared by Euler/Heun/KDPM2 schedulers."""

    def sigmas(self, num_inference_steps: int) -> np.ndarray:
        ac = self.alphas_cumprod
        all_sigmas = np.sqrt((1 - ac) / ac)
        ts = self.timesteps(num_inference_steps).astype(np.int64)
        sig = all_sigmas[ts]
        return np.append(sig, 0.0)  # terminal sigma 0

    def init_noise_sigma_for(self, num_inference_steps: int) -> float:
        return float(np.sqrt(self.sigmas(num_inference_steps)[0] ** 2 + 1))

    def scale_model_input(self, sample, i, state) -> jnp.ndarray:
        sig = state["sigmas"][i]
        return sample / jnp.sqrt(sig**2 + 1)

    def init_state(self, num_inference_steps, shape):
        return {"sigmas": _to_f32(self.sigmas(num_inference_steps))}

    def _x0_from_sigma(self, model_output, sample, sigma):
        if self.prediction_type == "epsilon":
            return sample - sigma * model_output
        if self.prediction_type == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (sigma**2 + 1)
        return model_output


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler(_KarrasMixin, BaseScheduler):
    def step(self, model_output, i, ts, sample, state, rng=None):
        sig, sig_next = state["sigmas"][i], state["sigmas"][i + 1]
        x0 = self._x0_from_sigma(model_output, sample, sig)
        d = (sample - x0) / sig
        return sample + d * (sig_next - sig), state


@dataclasses.dataclass(frozen=True)
class EulerAncestralDiscreteScheduler(_KarrasMixin, BaseScheduler):
    def step(self, model_output, i, ts, sample, state, rng=None):
        sig, sig_next = state["sigmas"][i], state["sigmas"][i + 1]
        x0 = self._x0_from_sigma(model_output, sample, sig)
        sigma_up = jnp.sqrt(
            jnp.clip(sig_next**2 * (sig**2 - sig_next**2) / sig**2, min=0.0)
        )
        sigma_down = jnp.sqrt(jnp.clip(sig_next**2 - sigma_up**2, min=0.0))
        d = (sample - x0) / sig
        prev = sample + d * (sigma_down - sig)
        if rng is not None:
            prev = prev + sigma_up * jax.random.normal(rng, sample.shape, sample.dtype)
        return prev, state


@dataclasses.dataclass(frozen=True)
class HeunDiscreteScheduler(_KarrasMixin, BaseScheduler):
    """Heun's 2nd-order method; one extra model call folded via state.
    ``interleaved=True``: drivers repeat the index for the corrector call.

    Functional formulation: `step` is called once per model evaluation;
    even calls are the Euler predictor, odd calls the Heun corrector
    (diffusers interleaves timesteps the same way).
    """

    interleaved: bool = True

    def init_state(self, num_inference_steps, shape):
        return {
            "sigmas": _to_f32(self.sigmas(num_inference_steps)),
            "prev_derivative": jnp.zeros(shape, jnp.float32),
            "sample": jnp.zeros(shape, jnp.float32),
            "in_correction": jnp.zeros((), jnp.bool_),
        }

    def scale_model_input(self, sample, i, state) -> jnp.ndarray:
        # corrector evaluates at sigma_{i+1} — scale accordingly
        # (diffusers Heun steps the interleaved sigma list the same way)
        sig = jnp.where(
            state["in_correction"], state["sigmas"][i + 1], state["sigmas"][i]
        )
        return sample / jnp.sqrt(sig**2 + 1)

    def model_timestep(self, i, ts, state):
        n = ts.shape[0]
        t_next = ts[jnp.minimum(i + 1, n - 1)]
        return jnp.where(state["in_correction"], t_next, ts[i]).astype(jnp.float32)

    def step(self, model_output, i, ts, sample, state, rng=None):
        sig, sig_next = state["sigmas"][i], state["sigmas"][i + 1]
        in_corr = state["in_correction"]

        x0 = self._x0_from_sigma(model_output, sample, jnp.where(in_corr, sig_next, sig))
        d = (sample - x0) / jnp.where(in_corr, sig_next, sig)
        dt = sig_next - sig

        # predictor: remember (sample, d); corrector: average derivatives
        prev_pred = sample + d * dt
        prev_corr = state["sample"] + 0.5 * (state["prev_derivative"] + d) * dt
        do_heun = sig_next > 0
        prev = jnp.where(in_corr, prev_corr, prev_pred)
        new_state = dict(
            state,
            prev_derivative=jnp.where(in_corr, state["prev_derivative"], d),
            sample=jnp.where(in_corr, state["sample"], sample),
            in_correction=jnp.logical_and(jnp.logical_not(in_corr), do_heun),
        )
        return prev, new_state


@dataclasses.dataclass(frozen=True)
class DPMSolverMultistepScheduler(BaseScheduler):
    """DPM-Solver++ (2M): 2nd-order multistep in log-SNR space."""

    solver_order: int = 2

    def init_state(self, num_inference_steps, shape):
        ts = self.timesteps(num_inference_steps).astype(np.int64)
        ac = self.alphas_cumprod[ts]
        alpha_t = np.sqrt(ac)
        sigma_t = np.sqrt(1 - ac)
        lam = np.log(alpha_t) - np.log(sigma_t)
        # append terminal (alpha=1, sigma->0): use last lambda + large gap
        return {
            "alpha": _to_f32(np.append(alpha_t, 1.0)),
            "sigma": _to_f32(np.append(sigma_t, 1e-4)),
            "lam": _to_f32(np.append(lam, np.log(1.0) - np.log(1e-4))),
            "m0": jnp.zeros(shape, jnp.float32),  # previous x0 prediction
            "have_m0": jnp.zeros((), jnp.bool_),
        }

    def step(self, model_output, i, ts, sample, state, rng=None):
        ac = _to_f32(self.alphas_cumprod)
        alpha_bar = ac[ts[i]]
        x0 = self._pred_x0(model_output, sample, alpha_bar)

        a_s, s_s, l_s = state["alpha"][i], state["sigma"][i], state["lam"][i]
        a_t, s_t, l_t = state["alpha"][i + 1], state["sigma"][i + 1], state["lam"][i + 1]
        h = l_t - l_s
        # first-order (DPM-Solver++ 1S) update
        first = (s_t / s_s) * sample - a_t * jnp.expm1(-h) * x0

        # second-order correction using previous x0 (2M)
        l_prev = state["lam"][jnp.maximum(i - 1, 0)]
        h_prev = l_s - l_prev
        r = jnp.where(h_prev != 0, h_prev / h, 1.0)
        d1 = (x0 - state["m0"]) / jnp.where(r != 0, r, 1.0)
        second = first - 0.5 * a_t * jnp.expm1(-h) * d1
        use_second = jnp.logical_and(state["have_m0"], self.solver_order >= 2)
        prev = jnp.where(use_second, second, first)
        new_state = dict(state, m0=x0, have_m0=jnp.ones((), jnp.bool_))
        return prev, new_state


@dataclasses.dataclass(frozen=True)
class DPMSolverSinglestepScheduler(DPMSolverMultistepScheduler):
    """DPM-Solver++(2S): true singlestep second order.

    Two model evaluations advance two grid intervals: the first (predictor)
    call does a 1S update to the midpoint grid index, the second call
    applies the 2S correction jumping from the saved start sample. Callers
    alternate calls exactly like HeunDiscrete (`in_correction`); with an
    odd number of evals the final step degrades to 1S.
    """

    solver_order: int = 2

    def init_state(self, num_inference_steps, shape):
        base = super().init_state(num_inference_steps, shape)
        return {
            "alpha": base["alpha"],
            "sigma": base["sigma"],
            "lam": base["lam"],
            "x_s": jnp.zeros(shape, jnp.float32),
            "x0_1": jnp.zeros(shape, jnp.float32),
            "start_i": jnp.zeros((), jnp.int32),
            "in_correction": jnp.zeros((), jnp.bool_),
        }

    def step(self, model_output, i, ts, sample, state, rng=None):
        ac = _to_f32(self.alphas_cumprod)
        n = ts.shape[0]
        in_corr = state["in_correction"]

        # ---------- predictor: 1S update i -> i+1 -----------------------
        alpha_bar_i = ac[ts[i]]
        x0_here = self._pred_x0(model_output, sample, alpha_bar_i)
        a_s, s_s, l_s = state["alpha"][i], state["sigma"][i], state["lam"][i]
        a_m, s_m, l_m = (
            state["alpha"][i + 1],
            state["sigma"][i + 1],
            state["lam"][i + 1],
        )
        h1 = l_m - l_s
        pred = (s_m / s_s) * sample - a_m * jnp.expm1(-h1) * x0_here

        # ---------- corrector: 2S jump start_i -> i+1 --------------------
        si = state["start_i"]
        a_s0, s_s0, l_s0 = state["alpha"][si], state["sigma"][si], state["lam"][si]
        a_t, s_t, l_t = state["alpha"][i + 1], state["sigma"][i + 1], state["lam"][i + 1]
        h = l_t - l_s0
        r = jnp.where(h != 0, (l_s - l_s0) / h, 0.5)  # l_s is the midpoint here
        x0_1 = state["x0_1"]
        d = (x0_here - x0_1) / jnp.where(r != 0, r, 1.0)
        corr = (
            (s_t / s_s0) * state["x_s"]
            - a_t * jnp.expm1(-h) * x0_1
            - 0.5 * a_t * jnp.expm1(-h) * d
        )

        # final-eval fallback: if this predictor has no following corrector
        # (last call), the 1S update is already the answer.
        prev = jnp.where(in_corr, corr, pred)
        new_state = dict(
            state,
            x_s=jnp.where(in_corr, state["x_s"], sample),
            x0_1=jnp.where(in_corr, state["x0_1"], x0_here),
            start_i=jnp.where(in_corr, state["start_i"], i),
            in_correction=jnp.logical_not(in_corr),
        )
        return prev, new_state


@dataclasses.dataclass(frozen=True)
class DEISMultistepScheduler(DPMSolverMultistepScheduler):
    """DEIS (Zhang & Chen 2022): exponential integrator with polynomial
    extrapolation of the *epsilon* prediction in rho = sigma/alpha space
    ("logrho" mode, order 2). Differs from DPM-Solver++ (which extrapolates
    x0 in log-SNR space): the second-order coefficients come from exact
    integration of the linear interpolant of eps over rho.
    """

    @staticmethod
    def _ind_fn(t, b, c):
        # Integrate[(log(x) - log(c)) / (log(b) - log(c)), {x, b, t}]
        return t * (jnp.log(c) - jnp.log(t) + 1.0) / (jnp.log(c) - jnp.log(b))

    def step(self, model_output, i, ts, sample, state, rng=None):
        ac = _to_f32(self.alphas_cumprod)
        alpha_bar = ac[ts[i]]
        # extrapolate EPS, not x0 (convert whatever the model predicts)
        eps = self._pred_eps(model_output, sample, alpha_bar)

        a_s, s_s, l_s = state["alpha"][i], state["sigma"][i], state["lam"][i]
        a_t, s_t, l_t = state["alpha"][i + 1], state["sigma"][i + 1], state["lam"][i + 1]
        h = l_t - l_s
        # first-order DEIS (== exponential Euler on eps; equals DDIM)
        first = (a_t / a_s) * sample - s_t * jnp.expm1(h) * eps

        # second-order: linear interpolant of eps through (rho_s1, m1),
        # (rho_s0, m0), integrated exactly over [rho_s0, rho_t]
        i_prev = jnp.maximum(i - 1, 0)
        rho_t = s_t / a_t
        rho_s0 = s_s / a_s
        rho_s1 = state["sigma"][i_prev] / state["alpha"][i_prev]
        coef1 = self._ind_fn(rho_t, rho_s0, rho_s1) - self._ind_fn(
            rho_s0, rho_s0, rho_s1
        )
        coef2 = self._ind_fn(rho_t, rho_s1, rho_s0) - self._ind_fn(
            rho_s0, rho_s1, rho_s0
        )
        second = a_t * (sample / a_s + coef1 * eps + coef2 * state["m0"])
        use_second = jnp.logical_and(state["have_m0"], self.solver_order >= 2)
        prev = jnp.where(use_second, second, first)
        new_state = dict(state, m0=eps, have_m0=jnp.ones((), jnp.bool_))
        return prev, new_state


@dataclasses.dataclass(frozen=True)
class PNDMScheduler(BaseScheduler):
    """PNDM (Liu et al. 2022, "Pseudo Numerical Methods for Diffusion
    Models"): pseudo Runge-Kutta (PRK) prologue bootstrapping a 4th-order
    pseudo linear multistep (PLMS / Adams-Bashforth) body.

    ``timesteps(n)`` returns the EVAL sequence (one model call per entry):
    with the prologue, 12 PRK evals (3 RK4 groups over the 3 highest
    intervals) followed by n-3 PLMS evals; with ``skip_prk_steps`` the
    PLMS warmup duplicates the second timestep (Heun-like corrector)
    giving n+1 evals. Each call advances the loop index by one — the state
    machine (ets ring buffer, RK accumulator) keys off the index.
    """

    skip_prk_steps: bool = False
    set_alpha_to_one: bool = False

    def _base_grid(self, num_inference_steps: int):
        step = self.num_train_timesteps // num_inference_steps
        grid = (np.arange(num_inference_steps) * step).round().astype(np.int64)
        return grid, step

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        grid, step = self._base_grid(num_inference_steps)
        if self.skip_prk_steps:
            seq = np.concatenate([grid[:-1], grid[-2:-1], grid[-1:]])[::-1]
        else:
            assert num_inference_steps >= 4, "PNDM prologue needs >= 4 steps"
            prk = np.array(grid[-4:]).repeat(2) + np.tile(
                np.array([0, step // 2]), 4
            )
            prk = (prk[:-1].repeat(2)[1:-1])[::-1]
            seq = np.concatenate([prk, grid[:-3][::-1]])
        return seq.astype(np.int64)

    def init_state(self, num_inference_steps, shape):
        _, step = self._base_grid(num_inference_steps)
        shape = tuple(shape)
        return {
            "ets": jnp.zeros((4,) + shape, jnp.float32),  # ring, newest last
            "n_ets": jnp.zeros((), jnp.int32),
            "cur_model_output": jnp.zeros(shape, jnp.float32),
            "cur_sample": jnp.zeros(shape, jnp.float32),
            "step_ratio": jnp.int32(step),
        }

    def _prev_sample(self, sample, t, prev_t, model_output):
        """The PNDM transfer step phi(x, t, t_prev, eps) — eq. (11) of the
        paper; matches diffusers ``PNDMScheduler._get_prev_sample``."""
        ac = _to_f32(self.alphas_cumprod)
        final_ac = 1.0 if self.set_alpha_to_one else float(self.alphas_cumprod[0])
        alpha_t = ac[jnp.clip(t, 0, self.num_train_timesteps - 1)]
        alpha_prev = jnp.where(
            prev_t >= 0, ac[jnp.clip(prev_t, 0, self.num_train_timesteps - 1)], final_ac
        )
        beta_t = 1 - alpha_t
        beta_prev = 1 - alpha_prev
        mo = model_output
        if self.prediction_type == "v_prediction":
            mo = jnp.sqrt(alpha_t) * mo + jnp.sqrt(beta_t) * sample
        sample_coeff = jnp.sqrt(alpha_prev / alpha_t)
        denom = alpha_t * jnp.sqrt(beta_prev) + jnp.sqrt(
            alpha_t * beta_t * alpha_prev
        )
        return sample_coeff * sample - (alpha_prev - alpha_t) * mo / denom

    def step(self, model_output, i, ts, sample, state, rng=None):
        step_ratio = state["step_ratio"]
        t_eval = ts[i]
        ets, n_ets = state["ets"], state["n_ets"]
        cmo, cur_sample = state["cur_model_output"], state["cur_sample"]

        # ---------------- PLMS branch (Adams-Bashforth up to order 4) ----
        plms_append = i != 1  # counter==1 re-steps with averaged eps
        ets_after = jnp.where(
            plms_append, jnp.concatenate([ets[1:], model_output[None]]), ets
        )
        n_after = jnp.minimum(n_ets + plms_append.astype(jnp.int32), 4)
        e1, e2, e3, e4 = ets_after[3], ets_after[2], ets_after[1], ets_after[0]
        mo_ab2 = (3 * e1 - e2) / 2
        mo_ab3 = (23 * e1 - 16 * e2 + 5 * e3) / 12
        mo_ab4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24
        mo_warm = jnp.where(
            i == 0, model_output, (model_output + e1) / 2  # i==1: avg corrector
        )
        used_mo = jnp.where(
            n_after == 1, mo_warm,
            jnp.where(n_after == 2, mo_ab2, jnp.where(n_after == 3, mo_ab3, mo_ab4)),
        )
        plms_t = jnp.where(i == 1, t_eval + step_ratio, t_eval)
        plms_prev_t = jnp.where(i == 1, t_eval, t_eval - step_ratio)
        plms_sample = jnp.where(i == 1, cur_sample, sample)
        plms_prev = self._prev_sample(plms_sample, plms_t, plms_prev_t, used_mo)
        plms_cur_sample = jnp.where(i == 0, sample, cur_sample)

        if self.skip_prk_steps:
            new_state = dict(
                state, ets=ets_after, n_ets=n_after, cur_sample=plms_cur_sample
            )
            return plms_prev, new_state

        # ---------------- PRK branch (i < 12: three RK4 groups) ----------
        k = i % 4
        half = step_ratio // 2
        prk_prev_t = t_eval - jnp.where(i % 2 == 0, half, 0)
        prk_t = ts[jnp.clip((i // 4) * 4, 0, ts.shape[0] - 1)]
        prk_cmo = jnp.where(
            k == 0, cmo + model_output / 6,
            jnp.where(k == 3, jnp.zeros_like(cmo), cmo + model_output / 3),
        )
        prk_used_mo = jnp.where(k == 3, cmo + model_output / 6, model_output)
        prk_cur_sample = jnp.where(k == 0, sample, cur_sample)
        prk_prev = self._prev_sample(prk_cur_sample, prk_t, prk_prev_t, prk_used_mo)
        prk_append = k == 0
        prk_ets = jnp.where(
            prk_append, jnp.concatenate([ets[1:], model_output[None]]), ets
        )
        prk_n = jnp.minimum(n_ets + prk_append.astype(jnp.int32), 4)

        is_prk = i < 12
        prev = jnp.where(is_prk, prk_prev, plms_prev)
        new_state = dict(
            state,
            ets=jnp.where(is_prk, prk_ets, ets_after),
            n_ets=jnp.where(is_prk, prk_n, n_after),
            cur_model_output=jnp.where(is_prk, prk_cmo, jnp.zeros_like(cmo)),
            cur_sample=jnp.where(is_prk, prk_cur_sample, plms_cur_sample),
        )
        return prev, new_state


@dataclasses.dataclass(frozen=True)
class KDPM2AncestralDiscreteScheduler(EulerAncestralDiscreteScheduler):
    """KDPM2 ancestral: 2nd-order midpoint method with ancestral noise.

    Two model evals per sigma interval (Heun-style interleave): the first
    steps to the log-space midpoint of (sigma_i, sigma_down); the second
    evaluates the derivative there and advances the SAVED sample to
    sigma_down, then adds sigma_up ancestral noise. The terminal interval
    (sigma_next == 0) falls back to a single Euler-ancestral step.
    """

    interleaved: bool = True

    def init_state(self, num_inference_steps, shape):
        base = super().init_state(num_inference_steps, shape)
        ac = self.alphas_cumprod
        all_sigmas = np.sqrt((1 - ac) / ac)
        return {
            "sigmas": base["sigmas"],
            # full training-sigma table for sigma->t inversion (the
            # corrector is conditioned at t(sigma_mid), diffusers
            # KDPM2AncestralDiscreteScheduler._sigma_to_t)
            "log_sigmas": _to_f32(np.log(all_sigmas)),
            "sample": jnp.zeros(shape, jnp.float32),
            "in_correction": jnp.zeros((), jnp.bool_),
        }

    def model_timestep(self, i, ts, state):
        _, _, _, _, sigma_mid = self._interval(state, i)
        log_sigmas = state["log_sigmas"]
        log_sigma = jnp.log(jnp.maximum(sigma_mid, 1e-10))
        # piecewise-linear inversion of the (ascending) log-sigma table
        # (k-diffusion sigma_to_t, as vendored by diffusers)
        dists = log_sigma - log_sigmas
        low_idx = jnp.clip(
            jnp.sum((dists >= 0).astype(jnp.int32)) - 1, 0, log_sigmas.shape[0] - 2
        )
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = jnp.clip((low - log_sigma) / (low - high), 0.0, 1.0)
        t_mid = (1 - w) * low_idx + w * high_idx
        return jnp.where(state["in_correction"], t_mid, ts[i].astype(jnp.float32))

    def _interval(self, state, i):
        sig = state["sigmas"][i]
        sig_next = state["sigmas"][i + 1]
        sigma_up = jnp.sqrt(
            jnp.clip(sig_next**2 * (sig**2 - sig_next**2) / sig**2, min=0.0)
        )
        sigma_down = jnp.sqrt(jnp.clip(sig_next**2 - sigma_up**2, min=0.0))
        # log-space midpoint of (sig, sigma_down); guard the terminal 0
        safe_down = jnp.maximum(sigma_down, 1e-10)
        sigma_mid = jnp.exp(0.5 * (jnp.log(sig) + jnp.log(safe_down)))
        return sig, sig_next, sigma_up, sigma_down, sigma_mid

    def scale_model_input(self, sample, i, state) -> jnp.ndarray:
        sig, _, _, _, sigma_mid = self._interval(state, i)
        s = jnp.where(state["in_correction"], sigma_mid, sig)
        return sample / jnp.sqrt(s**2 + 1)

    def step(self, model_output, i, ts, sample, state, rng=None):
        sig, sig_next, sigma_up, sigma_down, sigma_mid = self._interval(state, i)
        in_corr = state["in_correction"]
        terminal = sig_next <= 0.0

        # predictor phase: derivative at sig, step to the midpoint
        x0_p = self._x0_from_sigma(model_output, sample, sig)
        d_p = (sample - x0_p) / sig
        pred_mid = sample + d_p * (sigma_mid - sig)
        # terminal fallback (single Euler-ancestral step to sigma_down=0)
        pred_term = sample + d_p * (sigma_down - sig)

        # corrector phase: derivative at the midpoint, advance saved sample
        x0_c = self._x0_from_sigma(model_output, sample, sigma_mid)
        d_c = (sample - x0_c) / jnp.maximum(sigma_mid, 1e-10)
        corr = state["sample"] + d_c * (sigma_down - sig)

        out = jnp.where(in_corr, corr, jnp.where(terminal, pred_term, pred_mid))
        # ancestral noise applies when the interval completes
        completes = jnp.logical_or(in_corr, terminal)
        if rng is not None:
            noise = jax.random.normal(rng, sample.shape, sample.dtype)
            out = out + jnp.where(completes, sigma_up, 0.0) * noise
        new_state = dict(
            state,
            sample=jnp.where(in_corr, state["sample"], sample),
            in_correction=jnp.logical_and(
                jnp.logical_not(in_corr), jnp.logical_not(terminal)
            ),
        )
        return out, new_state


SCHEDULERS = {
    "DDIM": DDIMScheduler,
    "DDPM": DDPMScheduler,
    "EulerDiscrete": EulerDiscreteScheduler,
    "EulerAncestralDiscrete": EulerAncestralDiscreteScheduler,
    "HeunDiscrete": HeunDiscreteScheduler,
    "DPMSolverMultistep": DPMSolverMultistepScheduler,
    "DPMSolverSinglestep": DPMSolverSinglestepScheduler,
    "DEISMultistep": DEISMultistepScheduler,
    "PNDM": PNDMScheduler,
    "KDPM2AncestralDiscrete": KDPM2AncestralDiscreteScheduler,
}


def get_scheduler(name: str, **kwargs):
    """Factory covering the reference's scheduler menu
    (`sample/sample_t2x.py:43-114`)."""
    key = name.replace("Scheduler", "")
    if key not in SCHEDULERS:
        raise ValueError(f"unknown scheduler {name}; known: {sorted(SCHEDULERS)}")
    cls = SCHEDULERS[key]
    accepted = {f.name for f in dataclasses.fields(cls)}
    unknown = sorted(set(kwargs) - accepted)
    if unknown:
        raise ValueError(
            f"{cls.__name__} does not accept {unknown}; accepted config "
            f"keys: {sorted(accepted)}"
        )
    return cls(**kwargs)
