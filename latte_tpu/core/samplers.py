"""Sampling loops as jitted `lax.scan`s.

The reference runs Python for-loops over timesteps
(`/root/reference/diffusion/gaussian_diffusion.py:423-514,604-684`); on TPU
the whole denoising trajectory compiles to a single XLA while-loop so the
model forward, the schedule algebra, and the per-step RNG all fuse with no
host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from latte_tpu.core.diffusion import GaussianDiffusion, ModelFn

__all__ = [
    "p_sample_loop",
    "ddim_sample_loop",
    "ddim_reverse_loop",
    "cfg_model_fn",
]


def _run_loop(
    step_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]],
    diffusion: GaussianDiffusion,
    x_T: jnp.ndarray,
    rng: Optional[jax.Array],
    noise_schedule: Optional[jnp.ndarray],
    collect_trajectory: bool,
    loop: str = "scan",
):
    """Iterate `step_fn(x, t, noise)` over t = T-1 .. 0.

    Per-step noise comes from ``rng`` (folded in by timestep) or from an
    explicit ``noise_schedule`` of shape (T, *x.shape) — the latter enables
    bit-parity tests against recorded reference noise.

    ``loop``:
      - "scan": the whole trajectory is one `lax.scan` — a single XLA
        program, zero host round-trips (default; right for real pods).
      - "host": a Python loop around one jitted step. Functionally
        identical; avoids nested XLA while-loops (the model's scanned
        block stack is itself a loop), which some remote-attached TPU
        compilers handle poorly, at the cost of one dispatch per step.
    """

    def body(x, t_scalar):
        if noise_schedule is not None:
            noise = noise_schedule[t_scalar]
        elif rng is not None:
            noise = jax.random.normal(
                jax.random.fold_in(rng, t_scalar), x.shape, dtype=x.dtype
            )
        else:
            noise = jnp.zeros_like(x)
        t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
        out = step_fn(x, t, noise)
        y = out["sample"] if collect_trajectory else None
        return out["sample"], y

    if loop == "host":
        step = jax.jit(lambda x, t: body(x, t)[0])
        x = x_T
        traj = []
        for t_scalar in range(diffusion.num_timesteps - 1, -1, -1):
            x = step(x, jnp.int32(t_scalar))
            if collect_trajectory:
                traj.append(x)
        return (x, jnp.stack(traj)) if collect_trajectory else x

    ts = jnp.arange(diffusion.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    final, traj = jax.lax.scan(body, x_T, ts)
    return (final, traj) if collect_trajectory else final


def p_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    noise_schedule: Optional[jnp.ndarray] = None,
    collect_trajectory: bool = False,
    loop: str = "scan",
):
    """Ancestral DDPM sampling from pure noise x_T."""
    step = partial(
        diffusion.p_sample,
        model_fn,
        clip_denoised=clip_denoised,
        denoised_fn=denoised_fn,
        cond_fn=cond_fn,
        model_kwargs=model_kwargs,
    )
    return _run_loop(
        lambda x, t, n: step(x, t, n),
        diffusion,
        x_T,
        rng,
        noise_schedule,
        collect_trajectory,
        loop=loop,
    )


def ddim_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    eta: float = 0.0,
    noise_schedule: Optional[jnp.ndarray] = None,
    collect_trajectory: bool = False,
    loop: str = "scan",
):
    """DDIM sampling (deterministic at eta=0)."""
    step = partial(
        diffusion.ddim_sample,
        model_fn,
        clip_denoised=clip_denoised,
        denoised_fn=denoised_fn,
        cond_fn=cond_fn,
        model_kwargs=model_kwargs,
        eta=eta,
    )
    return _run_loop(
        lambda x, t, n: step(x, t, n),
        diffusion,
        x_T,
        rng,
        noise_schedule,
        collect_trajectory,
        loop=loop,
    )


def ddim_reverse_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    x_0: jnp.ndarray,
    clip_denoised: bool = True,
    model_kwargs: Optional[Dict[str, Any]] = None,
):
    """Deterministic encoding x_0 -> x_T via the reverse ODE."""
    ts = jnp.arange(diffusion.num_timesteps, dtype=jnp.int32)

    def body(x, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
        out = diffusion.ddim_reverse_sample(
            model_fn, x, t, clip_denoised=clip_denoised, model_kwargs=model_kwargs
        )
        return out["sample"], None

    final, _ = jax.lax.scan(body, x_0, ts)
    return final


def cfg_model_fn(
    model_apply: Callable[..., jnp.ndarray],
    cfg_scale: float,
    guidance_channels: int = 4,
) -> ModelFn:
    """Classifier-free-guidance wrapper matching the reference quirk.

    The batch carries [cond | uncond] halves; guidance is applied to only the
    first ``guidance_channels`` channels (the eps part), and both halves get
    the guided eps (reference `models/latte.py:379-398`). The input halves
    are assumed identical latents (the loop keeps them in lockstep).
    """

    def fn(x, t, **kwargs):
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = model_apply(combined, t, **kwargs)
        eps, rest = (
            model_out[:, :, :guidance_channels],
            model_out[:, :, guidance_channels:],
        )
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=2)

    return fn
