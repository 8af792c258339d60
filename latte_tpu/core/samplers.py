"""Sampling loops as jitted `lax.scan`s.

The reference runs Python for-loops over timesteps
(`/root/reference/diffusion/gaussian_diffusion.py:423-514,604-684`); on TPU
the whole denoising trajectory compiles to a single XLA while-loop so the
model forward, the schedule algebra, and the per-step RNG all fuse with no
host round-trips.

``loop`` modes:
- "scan": single XLA program (default; right for directly-attached pods).
- "host": Python loop around one jitted step. Functionally identical;
  required on remote-relay backends whose compiler cannot handle
  while-loops around the full model (docs/tpu_notes.md). Pass
  ``params`` + ``model_apply`` so the weights are an ARGUMENT of the
  jitted step — a closure over device arrays bakes them into the HLO
  as constants, which stalls compilation at full model scale.
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


def _noise_for(x, t_scalar, rng, noise_schedule):
    """Per-step noise: recorded schedule > rng folded by timestep > zeros."""
    if noise_schedule is not None:
        return noise_schedule[t_scalar]
    if rng is not None:
        return jax.random.normal(
            jax.random.fold_in(rng, t_scalar), x.shape, dtype=x.dtype
        )
    return jnp.zeros_like(x)


# Host-loop jitted steps, cached across `sample_loop` calls so repeated
# sampling (e.g. `sample_many` FVD iterations on the relay backend) does not
# re-trace per call.  Keys hold strong refs to the identity-keyed objects so
# ids cannot be recycled; the cache is small and FIFO-bounded.
_HOST_STEP_CACHE: Dict[Any, Any] = {}
_HOST_STEP_CACHE_LIMIT = 16


def _get_host_step(
    diffusion, kind, model_apply, noise_mode, kwarg_keys,
    clip_denoised, denoised_fn, cond_fn, eta,
):
    """Jitted single denoising step with params/x/t/rng/kwargs as ARGUMENTS
    (nothing value-like baked into the trace), memoized on the static
    pieces: (diffusion, kind, model_apply, flags)."""
    def parts(o):
        # normalize bound methods: `obj.method` is a fresh object on every
        # attribute access, but (__func__, __self__) identities are stable
        f = getattr(o, "__func__", None)
        if f is not None and hasattr(o, "__self__"):
            return (f, o.__self__)
        return (o,)

    refs = parts(diffusion) + parts(model_apply) + parts(denoised_fn) + parts(cond_fn)
    key = (
        tuple(map(id, refs)), kind, noise_mode, kwarg_keys,
        bool(clip_denoised), float(eta),
    )
    hit = _HOST_STEP_CACHE.get(key)
    if hit is not None and all(a is b for a, b in zip(hit[1], refs)):
        return hit[0]

    def host_step(params, x, t_scalar, *rest):
        if noise_mode == "sched":
            noise, mkvals = rest[0], rest[1:]
        elif noise_mode == "rng":
            noise = jax.random.normal(
                jax.random.fold_in(rest[0], t_scalar), x.shape, dtype=x.dtype
            )
            mkvals = rest[1:]
        else:
            noise = jnp.zeros_like(x)
            mkvals = rest
        model_kwargs = dict(zip(kwarg_keys, mkvals))
        mf = lambda xx, tt, **kw: model_apply(params, xx, tt, **kw)
        t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
        if kind == "ddim":
            out = diffusion.ddim_sample(
                mf, x, t, noise,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs, eta=eta,
            )
        else:
            out = diffusion.p_sample(
                mf, x, t, noise,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                cond_fn=cond_fn, model_kwargs=model_kwargs,
            )
        return out["sample"]

    jitted = jax.jit(host_step)
    if len(_HOST_STEP_CACHE) >= _HOST_STEP_CACHE_LIMIT:
        _HOST_STEP_CACHE.pop(next(iter(_HOST_STEP_CACHE)))
    _HOST_STEP_CACHE[key] = (jitted, refs)
    return jitted


def _sample_loop(
    kind: str,
    diffusion: GaussianDiffusion,
    model_fn: Optional[ModelFn],
    x_T: jnp.ndarray,
    rng: Optional[jax.Array],
    clip_denoised: bool,
    denoised_fn,
    cond_fn,
    model_kwargs,
    eta: float,
    noise_schedule,
    collect_trajectory: bool,
    loop: str,
    params=None,
    model_apply=None,
):
    def make_step(mf):
        if kind == "ddim":
            return partial(
                diffusion.ddim_sample,
                mf,
                clip_denoised=clip_denoised,
                denoised_fn=denoised_fn,
                cond_fn=cond_fn,
                model_kwargs=model_kwargs,
                eta=eta,
            )
        return partial(
            diffusion.p_sample,
            mf,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            model_kwargs=model_kwargs,
        )

    if loop == "host":
        if params is not None and model_apply is not None:
            noise_mode = (
                "sched" if noise_schedule is not None
                else "rng" if rng is not None
                else "none"
            )
            mk = dict(model_kwargs or {})
            kwarg_keys = tuple(sorted(mk))
            jstep = _get_host_step(
                diffusion, kind, model_apply, noise_mode, kwarg_keys,
                clip_denoised, denoised_fn, cond_fn, eta,
            )
            mkvals = tuple(mk[k] for k in kwarg_keys)

            def run(x, t_scalar):
                if noise_mode == "sched":
                    return jstep(
                        params, x, t_scalar, noise_schedule[int(t_scalar)], *mkvals
                    )
                if noise_mode == "rng":
                    return jstep(params, x, t_scalar, rng, *mkvals)
                return jstep(params, x, t_scalar, *mkvals)
        else:
            # closure fallback: fine for small models/tests; large weight
            # trees should use params/model_apply (see module docstring).
            # Not cached across calls — the closure identity is the cache key
            # a caller would need to keep stable, and small models retrace
            # cheaply.
            step = make_step(model_fn)

            def closure_step(x, t_scalar):
                t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
                noise = _noise_for(x, t_scalar, rng, noise_schedule)
                return step(x, t, noise)["sample"]

            run = jax.jit(closure_step)

        x, traj = x_T, []
        for t_scalar in range(diffusion.num_timesteps - 1, -1, -1):
            x = run(x, jnp.int32(t_scalar))
            if collect_trajectory:
                traj.append(x)
        return (x, jnp.stack(traj)) if collect_trajectory else x

    # scan mode: one XLA program over all timesteps
    if model_fn is None:
        assert params is not None and model_apply is not None
        model_fn = lambda xx, tt, **kw: model_apply(params, xx, tt, **kw)
    step = make_step(model_fn)

    def body(x, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, dtype=jnp.int32)
        noise = _noise_for(x, t_scalar, rng, noise_schedule)
        out = step(x, t, noise)
        return out["sample"], (out["sample"] if collect_trajectory else None)

    ts = jnp.arange(diffusion.num_timesteps - 1, -1, -1, dtype=jnp.int32)
    final, traj = jax.lax.scan(body, x_T, ts)
    return (final, traj) if collect_trajectory else final


def p_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: Optional[ModelFn],
    x_T: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    model_kwargs: Optional[Dict[str, Any]] = None,
    noise_schedule: Optional[jnp.ndarray] = None,
    collect_trajectory: bool = False,
    loop: str = "scan",
    params=None,
    model_apply=None,
):
    """Ancestral DDPM sampling from pure noise x_T."""
    return _sample_loop(
        "ddpm", diffusion, model_fn, x_T, rng, clip_denoised, denoised_fn,
        cond_fn, model_kwargs, 0.0, noise_schedule, collect_trajectory, loop,
        params, model_apply,
    )


def ddim_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: Optional[ModelFn],
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
    params=None,
    model_apply=None,
):
    """DDIM sampling (deterministic at eta=0)."""
    return _sample_loop(
        "ddim", diffusion, model_fn, x_T, rng, clip_denoised, denoised_fn,
        cond_fn, model_kwargs, eta, noise_schedule, collect_trajectory, loop,
        params, model_apply,
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
