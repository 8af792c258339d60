"""TPU-native Gaussian diffusion engine (iDDPM family).

Functional re-design of the classic OpenAI iDDPM engine with the same
capabilities as the reference (`/root/reference/diffusion/gaussian_diffusion.py`,
`respace.py`), built for JAX:

- All schedule tables are fp64 numpy, computed once host-side; they enter
  jitted programs as constants (gathers become cheap fused HLO).
- Every method is a pure function of jnp arrays — usable directly under
  `jax.jit`, `jax.grad`, `lax.scan`, and `shard_map`.
- Respacing is folded into the engine (``timestep_map``) instead of a model
  wrapper class: sampling loops run over respaced indices, and the engine
  remaps them to original-model timesteps right before the model call.
- Sampling loops live in :mod:`latte_tpu.core.samplers` as `lax.scan`s.

The model contract matches the reference seam (SURVEY.md §1): the engine
calls ``model_fn(x, t, **model_kwargs)`` where ``x`` is ``(B, F, C, H, W)``
and expects ``(B, F, 2C, H, W)`` when the variance is learned.
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.core.diffusion_utils import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)
from latte_tpu.core.schedules import get_named_beta_schedule, space_timesteps

ModelFn = Callable[..., jnp.ndarray]


class ModelMeanType(enum.Enum):
    """What the model's (mean-half) output predicts."""

    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    """How p(x_{t-1}|x_t) variance is produced."""

    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


def _broadcast(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape for broadcasting.

    ``arr`` is an fp64 numpy table; result is fp32 (matching the reference's
    gather-then-``.float()`` semantics, which is equivalent to an
    elementwise cast).
    """
    out = jnp.take(jnp.asarray(arr, dtype=jnp.float32), t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - 1))


class GaussianDiffusion:
    """The diffusion engine. Static (non-pytree): safe to close over in jit.

    Parameters
    ----------
    betas:
        fp64 per-step betas — possibly already respaced.
    timestep_map:
        When respaced, maps engine timestep index -> original model timestep.
    """

    def __init__(
        self,
        *,
        betas: np.ndarray,
        model_mean_type: ModelMeanType = ModelMeanType.EPSILON,
        model_var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
        loss_type: LossType = LossType.MSE,
        timestep_map: Optional[np.ndarray] = None,
        original_num_steps: Optional[int] = None,
    ):
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (0 < betas).all() and (betas <= 1).all()
        self.betas = betas
        self.num_timesteps = int(betas.shape[0])
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.loss_type = loss_type
        self.timestep_map = (
            None if timestep_map is None else np.asarray(timestep_map, dtype=np.int32)
        )
        self.original_num_steps = original_num_steps or self.num_timesteps

        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas, axis=0)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.alphas_cumprod_next = np.append(self.alphas_cumprod[1:], 0.0)

        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.log_one_minus_alphas_cumprod = np.log(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1.0)
        self.log_betas = np.log(betas)

        # q(x_{t-1} | x_t, x_0)
        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        # log-var clipped because posterior variance is 0 at t=0; for a
        # single-step schedule there is no t=1 entry to borrow, so fall
        # back to the (clipped) t=0 value
        _pv1 = (
            self.posterior_variance[1]
            if len(self.posterior_variance) > 1
            else max(self.posterior_variance[0], 1e-20)
        )
        self.posterior_log_variance_clipped = np.log(
            np.append(_pv1, self.posterior_variance[1:])
        )
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod)
        )
        # FIXED_LARGE uses betas with the t=0 entry replaced by posterior var.
        self._fixed_large_variance = np.append(_pv1, betas[1:])
        self._fixed_large_log_variance = np.log(self._fixed_large_variance)

    # ------------------------------------------------------------------
    # Timestep remapping (respacing)
    # ------------------------------------------------------------------
    def map_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Map engine timestep indices to original model timesteps."""
        if self.timestep_map is None:
            return t
        return jnp.take(jnp.asarray(self.timestep_map), t, axis=0)

    def _call_model(self, model_fn: ModelFn, x, t, model_kwargs) -> jnp.ndarray:
        return model_fn(x, self.map_t(t), **(model_kwargs or {}))

    # ------------------------------------------------------------------
    # Forward process q
    # ------------------------------------------------------------------
    def q_mean_variance(self, x_start, t):
        mean = _broadcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _broadcast(1.0 - self.alphas_cumprod, t, x_start.ndim)
        log_variance = _broadcast(self.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Diffuse x_0 to x_t given noise ~ N(0, I)."""
        return (
            _broadcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _broadcast(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (
            _broadcast(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _broadcast(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        variance = _broadcast(self.posterior_variance, t, x_t.ndim)
        log_variance = _broadcast(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, variance, log_variance

    # ------------------------------------------------------------------
    # Reverse process p
    # ------------------------------------------------------------------
    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _broadcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _broadcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = _broadcast(1.0 / self.posterior_mean_coef1, t, x_t.ndim)
        c2 = _broadcast(
            self.posterior_mean_coef2 / self.posterior_mean_coef1, t, x_t.ndim
        )
        return c1 * xprev - c2 * x_t

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return (
            _broadcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
        ) / _broadcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def split_learned_variance(self, model_output, x):
        """Split a learned-variance model output into (mean-part, var-part).

        Channel axis is 2 for (B, F, C, H, W) video tensors, matching the
        reference contract (`gaussian_diffusion.py:289-297`).
        """
        c = x.shape[2]
        return jnp.split(model_output, [c], axis=2)

    def model_log_variance_from_values(self, model_var_values, x, t):
        """LEARNED_RANGE: interpolate log-variance between posterior and beta."""
        min_log = _broadcast(self.posterior_log_variance_clipped, t, x.ndim)
        max_log = _broadcast(self.log_betas, t, x.ndim)
        frac = (model_var_values + 1.0) / 2.0
        return frac * max_log + (1.0 - frac) * min_log

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn: Optional[Callable] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
        model_output: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Compute p(x_{t-1} | x_t) mean/variance and the x_0 prediction.

        ``model_output`` may be supplied to reuse a precomputed forward pass
        (used by the training-loss VB term, which must not backprop the mean).
        """
        if model_output is None:
            model_output = self._call_model(model_fn, x, t, model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = self.split_learned_variance(
                model_output, x
            )
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                model_log_variance = self.model_log_variance_from_values(
                    model_var_values, x, t
                )
                model_variance = jnp.exp(model_log_variance)
        elif self.model_var_type == ModelVarType.FIXED_LARGE:
            model_variance = _broadcast(self._fixed_large_variance, t, x.ndim)
            model_log_variance = _broadcast(self._fixed_large_log_variance, t, x.ndim)
        else:  # FIXED_SMALL
            model_variance = _broadcast(self.posterior_variance, t, x.ndim)
            model_log_variance = _broadcast(
                self.posterior_log_variance_clipped, t, x.ndim
            )

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        elif self.model_mean_type == ModelMeanType.EPSILON:
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x, t, model_output)
            )
        else:  # PREVIOUS_X
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output)
            )

        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    # ------------------------------------------------------------------
    # Classifier guidance hooks
    # ------------------------------------------------------------------
    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Shift the mean by the (scaled) classifier gradient."""
        gradient = cond_fn(x, self.map_t(t), **(model_kwargs or {}))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Condition the score function (for DDIM-style guidance)."""
        alpha_bar = _broadcast(self.alphas_cumprod, t, x.ndim)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(
            x, self.map_t(t), **(model_kwargs or {})
        )
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # ------------------------------------------------------------------
    # Single reverse steps (the scan bodies live in samplers.py)
    # ------------------------------------------------------------------
    def p_sample(
        self,
        model_fn: ModelFn,
        x,
        t,
        noise,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
    ):
        """One DDPM ancestral step; `noise` must be caller-supplied N(0,I)."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised, denoised_fn, model_kwargs
        )
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t, model_kwargs)
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(
        self,
        model_fn: ModelFn,
        x,
        t,
        noise,
        clip_denoised: bool = True,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
    ):
        """One DDIM step (eta=0 deterministic)."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised, denoised_fn, model_kwargs
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs)
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])

        alpha_bar = _broadcast(self.alphas_cumprod, t, x.ndim)
        alpha_bar_prev = _broadcast(self.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self,
        model_fn: ModelFn,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
    ):
        """One step of the reverse (encoding) ODE, eta must be 0."""
        assert eta == 0.0, "ReverseODE only for deterministic path"
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised, denoised_fn, model_kwargs
        )
        eps = (
            _broadcast(self.sqrt_recip_alphas_cumprod, t, x.ndim) * x
            - out["pred_xstart"]
        ) / _broadcast(self.sqrt_recipm1_alphas_cumprod, t, x.ndim)
        alpha_bar_next = _broadcast(self.alphas_cumprod_next, t, x.ndim)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # ------------------------------------------------------------------
    # Variational bound & training losses
    # ------------------------------------------------------------------
    def _vb_terms_bpd(
        self,
        model_fn: ModelFn,
        x_start,
        x_t,
        t,
        clip_denoised: bool = True,
        model_kwargs=None,
        model_output: Optional[jnp.ndarray] = None,
    ):
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model_fn,
            x_t,
            t,
            clip_denoised=clip_denoised,
            model_kwargs=model_kwargs,
            model_output=model_output,
        )
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)

        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)

        # t == 0: decoder NLL, else KL.
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start,
        t,
        model_kwargs=None,
        noise: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Per-example training losses (shape [B]).

        Hybrid MSE + VB loss for LEARNED_RANGE, exactly mirroring the
        reference semantics (`gaussian_diffusion.py:719-795`): the VB term
        sees a stop-gradient'ed mean so only the variance head learns from it.
        """
        if noise is None:
            if rng is None:
                raise ValueError("training_losses needs `noise` or `rng`")
            noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        terms: Dict[str, jnp.ndarray] = {}
        if self.loss_type.is_vb():
            terms["loss"] = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False, model_kwargs=model_kwargs
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = self._call_model(model_fn, x_t, t, model_kwargs)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            mean_out, var_values = self.split_learned_variance(model_output, x_t)
            # Freeze the mean for the VB term so it only trains the variance.
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(mean_out), var_values], axis=2
            )
            terms["vb"] = self._vb_terms_bpd(
                model_fn,
                x_start,
                x_t,
                t,
                clip_denoised=False,
                model_output=frozen_out,
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)
            model_output = mean_out

        target = {
            ModelMeanType.PREVIOUS_X: lambda: self.q_posterior_mean_variance(
                x_start, x_t, t
            )[0],
            ModelMeanType.START_X: lambda: x_start,
            ModelMeanType.EPSILON: lambda: noise,
        }[self.model_mean_type]()
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    # ------------------------------------------------------------------
    # Bits-per-dim evaluation
    # ------------------------------------------------------------------
    def _prior_bpd(self, x_start):
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)

    def calc_bpd_loop(
        self, model_fn: ModelFn, x_start, rng, clip_denoised=True, model_kwargs=None
    ):
        """Full VB evaluation over all timesteps via lax.scan."""
        batch = x_start.shape[0]

        def body(carry, t_scalar):
            key = jax.random.fold_in(rng, t_scalar)
            t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
            noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised, model_kwargs
            )
            eps = self._predict_eps_from_xstart(x_t, t, out["pred_xstart"])
            xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
            return carry, (out["output"], xstart_mse, mean_flat((eps - noise) ** 2))

        ts = jnp.arange(self.num_timesteps, dtype=jnp.int32)[::-1]
        _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, ts)
        vb = vb.T  # (B, T)
        prior_bpd = self._prior_bpd(x_start)
        total_bpd = vb.sum(axis=1) + prior_bpd
        return {
            "total_bpd": total_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse.T,
            "mse": mse.T,
        }


def create_diffusion(
    timestep_respacing: Union[str, Sequence[int], None],
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
) -> GaussianDiffusion:
    """Factory with the reference defaults (`diffusion/__init__.py:10-47`):

    1000 linear steps, epsilon prediction, LEARNED_RANGE variance, MSE loss.
    Passing e.g. ``"ddim50"`` or ``"250"`` respaces the process.
    """
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE

    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    use_timesteps = space_timesteps(diffusion_steps, timestep_respacing)

    # Respace: recompute betas over the retained subset of alphas_cumprod.
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    timestep_map, new_betas = [], []
    last = 1.0
    for i, ab in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - ab / last)
            last = ab
            timestep_map.append(i)

    return GaussianDiffusion(
        betas=np.array(new_betas, dtype=np.float64),
        model_mean_type=(
            ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON
        ),
        model_var_type=(
            ModelVarType.LEARNED_RANGE
            if learn_sigma
            else (ModelVarType.FIXED_SMALL if sigma_small else ModelVarType.FIXED_LARGE)
        ),
        loss_type=loss_type,
        timestep_map=np.array(timestep_map, dtype=np.int32)
        if len(timestep_map) != diffusion_steps
        else None,
        original_num_steps=diffusion_steps,
    )
