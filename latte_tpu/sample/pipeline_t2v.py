"""LattePipeline: text-to-video generation pipeline.

Capability parity with `/root/reference/sample/pipeline_latte.py:71-798`:
T5 prompt encoding with negative prompts, latent preparation scaled by the
scheduler's ``init_noise_sigma``, a CFG denoising loop ([uncond ‖ cond]
ordering, guidance on all channels, learned-sigma half dropped before the
scheduler step), and three decode paths (per-frame image, per-frame video,
chunked temporal decoder, chunk=14).

TPU-native: the scheduler is a functional strategy object
(:mod:`latte_tpu.core.scheduler`) whose state threads through the loop, so
the loop runs either host-driven (one jitted step) or as a single
`lax.scan` program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class VideoPipelineOutput:
    video: np.ndarray  # (B, F, H, W, 3) float in [0, 1]


class LattePipeline:
    """T2V pipeline over (vae, text_encoder, transformer, scheduler).

    ``transformer_params`` / ``vae_params`` are Flax param trees; the text
    encoder is a :class:`latte_tpu.text.T5TextEncoder`.
    """

    def __init__(
        self,
        transformer,
        transformer_params,
        scheduler,
        text_encoder=None,
        vae=None,
        vae_params=None,
        temporal_decoder=None,
        temporal_decoder_params=None,
        vae_scale: float = 0.18215,
        vae_spatial_scale: int = 8,
        pp_mesh=None,
        pp_microbatches: int = 2,
        block_cache_interval: int = 0,
        block_cache_pairs=None,
    ):
        self.transformer = transformer
        self.transformer_params = transformer_params
        # block-cache serving (core/block_cache.py rationale): the front
        # `block_cache_pairs` of the pair stack recompute only every
        # `block_cache_interval`-th transformer evaluation. Host-driven
        # loop -> two jitted step specializations, no lax.cond needed.
        self.bc_interval = int(block_cache_interval or 0)
        if self.bc_interval > 1:
            if pp_mesh is not None:
                raise ValueError(
                    "block_cache_interval does not compose with pp_mesh "
                    "(the pipelined forward has no staging hooks)"
                )
            n_pairs = transformer.num_layers
            self.bc_pairs = int(block_cache_pairs or (n_pairs * 2) // 3)
            if not 1 <= self.bc_pairs < n_pairs:
                raise ValueError(
                    f"block_cache_pairs must be in [1, {n_pairs}), got {self.bc_pairs}"
                )
            from latte_tpu.core.block_cache import _slice_back_params

            self._p_back = _slice_back_params(transformer_params, self.bc_pairs)
        # pp_mesh: a Mesh carrying a "pp" axis — the denoise transformer
        # runs depth-sharded via dist.pipeline.pipelined_t2v_forward, for
        # checkpoints whose transformer exceeds one chip's HBM
        self.pp_mesh = pp_mesh
        self.pp_microbatches = pp_microbatches
        self.scheduler = scheduler
        self.text_encoder = text_encoder
        self.vae = vae
        self.vae_params = vae_params
        self.temporal_decoder = temporal_decoder
        self.temporal_decoder_params = temporal_decoder_params
        self.vae_scale = vae_scale
        self.vae_spatial_scale = vae_spatial_scale

        def step_fn(params, latents, state, ctx, ctx_mask, i, ts, guidance_scale, rng, do_cfg, front=None, cache=None):
            latent_in = jnp.concatenate([latents, latents]) if do_cfg else latents
            latent_in = self.scheduler.scale_model_input(latent_in, i, state)
            # schedulers pick the conditioning timestep: interleaved
            # 2nd-order correctors evaluate at a later (possibly
            # fractional) sigma than ts[i] — the sinusoidal embedding is
            # continuous, so a float32 timestep is fine
            t_scalar = self.scheduler.model_timestep(i, ts, state)
            t = jnp.full((latent_in.shape[0],), t_scalar, jnp.float32)
            if self.pp_mesh is not None:
                from latte_tpu.dist.pipeline import pipelined_t2v_forward

                # largest feasible microbatch count <= requested (shapes
                # are static at trace time; e.g. no-CFG single-prompt B=1)
                mb = min(self.pp_microbatches, latent_in.shape[0])
                while latent_in.shape[0] % mb:
                    mb -= 1
                noise_pred = pipelined_t2v_forward(
                    self.transformer, params, latent_in, t, ctx, ctx_mask,
                    mesh=self.pp_mesh, microbatches=mb,
                )
            elif cache == "full":
                noise_pred, front = self.transformer.apply(
                    params, latent_in, t, ctx, ctx_mask,
                    return_front=self.bc_pairs,
                )
            elif cache == "partial":
                noise_pred = self.transformer.apply(
                    self._p_back, latent_in, t, ctx, ctx_mask,
                    front_state=front, start_pair=self.bc_pairs,
                )
            else:
                noise_pred = self.transformer.apply(
                    params, latent_in, t, ctx, ctx_mask
                )
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            # learned sigma: keep the eps half only
            c = latents.shape[1]
            if noise_pred.shape[1] == 2 * c:
                noise_pred = noise_pred[:, :c]
            # rng threads into every step so stochastic schedulers (DDPM,
            # the ancestral family, DDIM eta>0) draw their noise term —
            # the reference passes a generator into each scheduler.step
            # (`pipeline_latte.py:724`).
            nxt = self.scheduler.step(noise_pred, i, ts, latents, state, rng=rng)
            return (*nxt, front) if cache else nxt

        # do_cfg / guidance static via two specializations
        self._step = jax.jit(
            lambda p, l, s, c, m, i, ts, g, r: step_fn(p, l, s, c, m, i, ts, g, r, True)
        )
        self._step_nocfg = jax.jit(
            lambda p, l, s, c, m, i, ts, g, r: step_fn(p, l, s, c, m, i, ts, g, r, False)
        )
        if self.bc_interval > 1:
            # four more specializations: {cfg} x {full, partial}
            self._step_bc = {
                (cfg, mode): jax.jit(
                    lambda p, l, s, c, m, i, ts, g, r, f, cfg=cfg, mode=mode: step_fn(
                        p, l, s, c, m, i, ts, g, r, cfg, front=f, cache=mode
                    )
                )
                for cfg in (True, False)
                for mode in ("full", "partial")
            }
        if self.vae is not None:
            from latte_tpu.vae import make_decode_fn

            self._decode = make_decode_fn(self.vae, self.vae_params)
        if self.temporal_decoder is not None:
            # hoisted: one jitted callable reused across calls, so jax's
            # jit cache persists (at most two shape specializations: the
            # 14-frame chunk and the F % 14 remainder)
            self._decode_temporal_jit = jax.jit(
                lambda p, zz: self.temporal_decoder.apply(
                    p, zz, num_frames=zz.shape[0], method=self.temporal_decoder.decode
                )
            )

    # -- prompt encoding -------------------------------------------------
    def encode_prompt(
        self,
        prompt: Sequence[str],
        negative_prompt: str = "",
        do_cfg: bool = True,
        clean_caption: bool = True,
    ):
        assert self.text_encoder is not None, "pipeline built without text encoder"
        cond, cond_mask, uncond, uncond_mask = self.text_encoder.encode_with_negative(
            list(prompt), negative_prompt, clean=clean_caption
        )
        if do_cfg:
            # [uncond ‖ cond] ordering (reference `pipeline_latte.py:283-285`)
            return (
                jnp.concatenate([uncond, cond], axis=0),
                jnp.concatenate([uncond_mask, cond_mask], axis=0),
            )
        return cond, cond_mask

    # -- latents ---------------------------------------------------------
    def prepare_latents(
        self,
        batch: int,
        channels: int,
        video_length: int,
        height: int,
        width: int,
        rng,
        num_inference_steps: int = 50,
    ) -> jnp.ndarray:
        f = self.vae_spatial_scale
        shape = (batch, channels, video_length, height // f, width // f)
        z = jax.random.normal(rng, shape, jnp.float32)
        return z * self.scheduler.init_noise_sigma_for(num_inference_steps)

    # -- main ------------------------------------------------------------
    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        video_length: int = 16,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: str = "",
        seed: int = 0,
        enable_temporal_attentions: bool = True,
        enable_vae_temporal_decoder: bool = False,
        output_type: str = "video",
        clean_caption: bool = True,
    ) -> VideoPipelineOutput:
        if isinstance(prompt, str):
            prompt = [prompt]
        batch = len(prompt)
        do_cfg = guidance_scale > 1.0

        # temporal attention is baked into the transformer at construction
        # (its params exist or not); a silently-ignored per-call toggle
        # would return temporally-attended output for a caller who asked
        # to disable it
        built = bool(getattr(self.transformer, "enable_temporal_attentions", True))
        if bool(enable_temporal_attentions) != built:
            raise ValueError(
                f"enable_temporal_attentions={enable_temporal_attentions} "
                f"but the transformer was built with {built} — rebuild the "
                "transformer (sample_t2x config enable_temporal_attentions) "
                "to change it"
            )

        ctx, ctx_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg=do_cfg, clean_caption=clean_caption
        )

        rng = jax.random.PRNGKey(seed)
        latents = self.prepare_latents(
            batch, self.transformer.in_channels, video_length, height, width, rng,
            num_inference_steps=num_inference_steps,
        )

        ts_np = self.scheduler.timesteps(num_inference_steps)
        ts = jnp.asarray(ts_np, jnp.int32)
        n_indices = int(ts_np.shape[0])  # may exceed num_inference_steps (PNDM prologue)
        state = self.scheduler.init_state(num_inference_steps, latents.shape)
        step = self._step if do_cfg else self._step_nocfg
        g = jnp.float32(guidance_scale)
        interleaved = bool(getattr(self.scheduler, "interleaved", False))
        use_bc = self.bc_interval > 1
        front = None
        if use_bc:
            # front activation: ((cfg?2:1)·B·F, T, D) in the model dtype
            bsz = latents.shape[0] * (2 if do_cfg else 1)
            T = (latents.shape[3] // self.transformer.patch_size) * (
                latents.shape[4] // self.transformer.patch_size
            )
            front = jnp.zeros(
                (bsz * latents.shape[2], T, self.transformer.inner_dim),
                self.transformer.dtype,
            )
        i = 0
        calls = 0
        while i < n_indices and calls < 3 * n_indices:
            if use_bc:
                mode = "full" if calls % self.bc_interval == 0 else "partial"
                latents, state, front = self._step_bc[(do_cfg, mode)](
                    self.transformer_params, latents, state, ctx, ctx_mask,
                    jnp.int32(i), ts, g, jax.random.fold_in(rng, calls + 1),
                    front,
                )
            else:
                latents, state = step(
                    self.transformer_params, latents, state, ctx, ctx_mask,
                    jnp.int32(i), ts, g, jax.random.fold_in(rng, calls + 1),
                )
            calls += 1
            if interleaved and bool(state["in_correction"]):
                continue  # corrector call repeats the same index
            i += 1

        if output_type == "latents":
            return VideoPipelineOutput(video=np.asarray(latents))

        if latents.shape[2] == 1:
            video = self.decode_latents_image(latents)
        elif enable_vae_temporal_decoder and self.temporal_decoder is not None:
            video = self.decode_latents_with_temporal_decoder(latents)
        else:
            video = self.decode_latents(latents)
        return VideoPipelineOutput(video=video)

    # -- decoding --------------------------------------------------------
    def _decode_frames(self, flat: jnp.ndarray) -> np.ndarray:
        return np.asarray(self._decode(flat))

    def decode_latents_image(self, latents) -> np.ndarray:
        return self.decode_latents(latents)

    def decode_latents(self, latents) -> np.ndarray:
        """(B, C, F, h, w) -> (B, F, H, W, 3) in [0, 1], per-frame VAE."""
        assert self.vae is not None, "pipeline built without VAE"
        B, C, F, h, w = latents.shape
        z = latents.transpose(0, 2, 1, 3, 4).reshape(B * F, C, h, w)
        z = z / self.vae_scale
        video = self._decode_frames(z)  # (B*F, 3, H, W)
        video = video.reshape(B, F, *video.shape[1:]).transpose(0, 1, 3, 4, 2)
        return (np.clip(video / 2 + 0.5, 0, 1)).astype(np.float32)

    def decode_latents_with_temporal_decoder(self, latents) -> np.ndarray:
        """Chunked SVD temporal decoder (chunk 14, reference
        `pipeline_latte.py:785-792`)."""
        assert self.temporal_decoder is not None
        B, C, F = latents.shape[:3]
        z = latents.transpose(0, 2, 1, 3, 4).reshape(B * F, C, *latents.shape[3:])
        z = z / self.vae_scale
        chunks, out = 14, []
        for s in range(0, z.shape[0], chunks):
            out.append(
                np.asarray(
                    self._decode_temporal_jit(
                        self.temporal_decoder_params, z[s : s + chunks]
                    )
                )
            )
        video = np.concatenate(out, axis=0)
        video = video.reshape(B, F, *video.shape[1:]).transpose(0, 1, 3, 4, 2)
        return (np.clip(video / 2 + 0.5, 0, 1)).astype(np.float32)
