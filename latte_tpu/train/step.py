"""The jitted training step.

One fused XLA program per step: q_sample -> model forward -> hybrid
MSE+VB loss -> grad -> grad-norm (+ deferred clipping) -> AdamW -> EMA.
Under a ``dp``-sharded batch, jit/XLA insert the gradient all-reduce over
ICI automatically — the TPU equivalent of DDP backward hooks
(`/root/reference/train.py:125,223-235`).

Reference semantics preserved:
- grad clipping activates only after ``start_clip_iter``
  (`train.py:225-228`); the norm is always reported.
- EMA decay 0.9999 after every optimizer step (`utils.py:190-200`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from latte_tpu.core.diffusion import GaussianDiffusion
from latte_tpu.train.state import TrainState, update_ema


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    optimizer: optax.GradientTransformation,
    *,
    ema_decay: float = 0.9999,
    ema_every: int = 1,
    clip_max_norm: float = 0.1,
    start_clip_iter: int = 0,
    extras: int = 1,
    encode_fn: Optional[Callable] = None,
    fixed_spatial: bool = False,
    apply_fn: Optional[Callable] = None,
    grad_accum: int = 1,
    moe_aux_weight: float = 0.0,
    vae_scale: float = 0.18215,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array], Tuple[TrainState, Dict]]:
    """Build the jittable train step.

    ``batch``: {"latents": (B,F,C,H,W) fp32 VAE latents (already scaled),
    "y": optional (B,) int labels, "y_image": optional (B,I) labels}.
    When ``encode_fn(video, rng, encode_params) -> latents`` is given, the
    batch carries raw pixels under "video" and VAE encoding fuses into the
    same XLA program (the reference runs it as a separate no_grad pass,
    `train.py:206-211`); the frozen VAE params flow in as the
    ``encode_params`` argument — closing over them would bake the weight
    tree into the compiled HLO.

    ``apply_fn`` overrides ``model.apply`` with the same call signature
    (variables, x, t, train=..., rngs=..., **kw) — the hook that lets the
    pipeline-parallel forward (`dist/pipeline.py`) drive the identical
    loss/optimizer/EMA step.

    ``grad_accum`` = K > 1 splits the batch into K chunks and runs the
    forward/backward as a `lax.scan`, averaging gradients before the single
    optimizer update — one chunk's activations live at a time, so the
    effective batch grows K-fold at constant activation memory (the
    reference's `gradient_accumulation_steps` knob, left TODO at
    `/root/reference/train.py`, realized TPU-side as scanned accumulation
    inside ONE XLA program rather than K driver steps).
    """
    if apply_fn is None:
        apply_fn = model.apply

    def _chunk_grads(params, batch, rng, encode_params):
        """loss/grads for one (sub-)batch; rng covers t/noise/dropout/vae."""
        rng_t, rng_noise, rng_drop, rng_vae = jax.random.split(rng, 4)
        if encode_fn is not None:
            video = batch["video"]
            if video.dtype == jnp.uint8:
                # uint8 transport: dequantize on device (inverse of
                # data.loader.quantize_video_u8) — 4x less H2D traffic
                video = video.astype(jnp.float32) / 127.5 - 1.0
            latents = jax.lax.stop_gradient(
                encode_fn(video, rng_vae, encode_params)
            )
        elif "latent_mean" in batch:
            # latent-cache path (tools/cache_latents.py): the dataset was
            # VAE-encoded ONCE offline; the cache stores the posterior
            # MOMENTS, so each step still draws a fresh posterior sample —
            # statistically identical to online encoding at zero encode
            # FLOPs. Sampling mirrors DiagonalGaussianDistribution.sample
            # on the frame-flattened (B·F, C, h, w) layout so losses match
            # the fused-encode path bit-for-bit given the same rng.
            mean, std = batch["latent_mean"], batch["latent_std"]
            Bm, Fm = mean.shape[:2]
            flat = (Bm * Fm,) + mean.shape[2:]
            eps = jax.random.normal(rng_vae, flat, dtype=mean.dtype)
            latents = (
                (mean.reshape(flat) + std.reshape(flat) * eps) * vae_scale
            ).reshape(mean.shape)
        else:
            latents = batch["latents"]
        B = latents.shape[0]
        if "t" in batch:
            # externally importance-sampled timesteps (schedule_sampler:
            # loss-second-moment — reference analog
            # `/root/reference/diffusion/timestep_sampler.py:44-79`)
            t = batch["t"].astype(jnp.int32)
        else:
            t = jax.random.randint(
                rng_t, (B,), 0, diffusion.num_timesteps, dtype=jnp.int32
            )

        model_kwargs = {}
        if extras == 2:
            model_kwargs["y"] = batch["y"]
            if "y_image" in batch:
                model_kwargs["y_image"] = batch["y_image"]
        elif extras == 78:
            model_kwargs["text_embedding"] = batch["text_embedding"]

        def loss_fn(params):
            # MoE models sow their load-balancing losses under
            # "intermediates" (models/moe.py); training_losses calls the
            # model exactly once in the hybrid path, so collecting the
            # sown tracers in a box is sound
            aux_box = []

            def model_fn(x, tt, **kw):
                if moe_aux_weight > 0.0:
                    out, mut = apply_fn(
                        {"params": params},
                        x,
                        tt,
                        train=True,
                        rngs={"label_dropout": rng_drop},
                        mutable=["intermediates"],
                        **kw,
                    )
                    aux_box.extend(jax.tree_util.tree_leaves(mut))
                    return out
                return apply_fn(
                    {"params": params},
                    x,
                    tt,
                    train=True,
                    rngs={"label_dropout": rng_drop},
                    **kw,
                )

            terms = diffusion.training_losses(
                model_fn, latents, t, model_kwargs=model_kwargs, rng=rng_noise
            )
            per_sample = terms["loss"]
            if "t_weights" in batch:
                # importance-sampling correction: E_p[w(t) L(t)] = E_U[L]
                per_sample = per_sample * batch["t_weights"]
            loss = jnp.mean(per_sample)
            if moe_aux_weight > 0.0 and aux_box:
                # each sown leaf is the per-pair stack from one block
                # column (spatial/temporal); average to a per-block mean
                aux = sum(jnp.mean(a) for a in aux_box) / len(aux_box)
                terms["moe_aux"] = aux
                loss = loss + moe_aux_weight * aux
            return loss, terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, terms, t, grads

    def train_step(state: TrainState, batch, rng: jax.Array, encode_params=None):
        rng = jax.random.fold_in(rng, state.step)
        if grad_accum == 1:
            loss, terms, t, grads = _chunk_grads(
                state.params, batch, rng, encode_params
            )
        else:
            K = grad_accum
            # row r -> chunk r % K (interleaved): under a dp-sharded batch
            # every chunk draws rows from EVERY device (a contiguous split
            # would run each chunk on a fraction of the mesh); samples are
            # exchangeable, so the assignment itself is free to differ from
            # a contiguous split
            cbatch = jax.tree_util.tree_map(
                lambda a: jnp.moveaxis(
                    a.reshape(a.shape[0] // K, K, *a.shape[1:]), 1, 0
                ),
                batch,
            )

            def body(g_acc, inp):
                k, bk = inp
                loss_k, terms_k, t_k, g_k = _chunk_grads(
                    state.params, bk, jax.random.fold_in(rng, k), encode_params
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_k)
                scal = {"loss": loss_k, "mse": jnp.mean(terms_k["mse"])}
                if "vb" in terms_k:
                    scal["vb"] = jnp.mean(terms_k["vb"])
                if "moe_aux" in terms_k:
                    scal["moe_aux"] = terms_k["moe_aux"]
                return g_acc, (scal, t_k, terms_k["loss"])

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            g_sum, (scals, t_all, per_sample_all) = jax.lax.scan(
                body, g0, (jnp.arange(1, K + 1), cbatch)
            )
            grads = jax.tree_util.tree_map(lambda g: g / K, g_sum)
            loss = jnp.mean(scals["loss"])
            t = t_all.reshape(-1)
            terms = {"mse": scals["mse"], "loss": per_sample_all.reshape(-1)}
            if "vb" in scals:
                terms["vb"] = scals["vb"]
            if "moe_aux" in scals:
                terms["moe_aux"] = scals["moe_aux"]

        if fixed_spatial:
            # fine-tune only the temporal attention (reference
            # `train_with_img.py:124-134`: everything but attn_temp frozen)
            def mask(path, g):
                keys = jax.tree_util.keystr(path)
                keep = ("temporal" in keys) and ("attn" in keys)
                return g if keep else jnp.zeros_like(g)

            grads = jax.tree_util.tree_map_with_path(mask, grads)

        grad_norm = global_norm(grads)
        # Clip only once step >= start_clip_iter (reference behavior); the
        # condition is data-independent-per-trace but step-dependent, so we
        # express it with a where on the scale factor.
        clip_scale = jnp.where(
            state.step >= start_clip_iter,
            jnp.minimum(1.0, clip_max_norm / (grad_norm + 1e-6)),
            1.0,
        )
        grads = jax.tree_util.tree_map(lambda g: g * clip_scale, grads)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_every <= 1:
            ema_params = update_ema(state.ema_params, params, ema_decay)
        else:
            # EMA refresh every K steps at decay^K — the same time constant
            # as per-step EMA to first order (the K-1 skipped params are
            # approximated by the K-th; decay 0.9999 moves 1e-4 per step, so
            # the within-window drift is negligible). The lax.cond identity
            # branch lets XLA skip the 2×params HBM read+write on the K-1
            # off-steps — the EMA share of the optimizer-bandwidth floor
            # (docs/tpu_notes.md "training roofline").
            ema_params = jax.lax.cond(
                (state.step + 1) % ema_every == 0,
                lambda e, p: update_ema(e, p, ema_decay**ema_every),
                lambda e, p: e,
                state.ema_params,
                params,
            )

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        metrics = {
            "loss": loss,
            "mse": jnp.mean(terms["mse"]),
            "grad_norm": grad_norm,
            "t_mean": jnp.mean(t.astype(jnp.float32)),
        }
        if "vb" in terms:
            metrics["vb"] = jnp.mean(terms["vb"])
        if "moe_aux" in terms:
            metrics["moe_aux"] = jnp.mean(terms["moe_aux"])
        if "t" in batch:
            # per-sample feedback for the loss-aware resampler (unweighted
            # losses — the history tracks L(t), not w(t)L(t))
            metrics["t_sampled"] = t
            metrics["per_sample_loss"] = terms["loss"]
        return new_state, metrics

    return train_step
