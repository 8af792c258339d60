"""T2V / T2I sampling entry point.

Capability parity with `/root/reference/sample/sample_t2x.py:24-170`: build
LatteT2V + VAE (+ optional SVD temporal decoder) + T5, pick one of the 10
schedulers, drive :class:`latte_tpu.sample.pipeline_t2v.LattePipeline`, and
write png (video_length == 1) or mp4 outputs.

Checkpoint wiring (no network egress — all paths local):
- ``config.ckpt``: LatteT2V weights (.pt / .safetensors, diffusers naming)
- ``config.vae_ckpt``: orbax dir of converted AutoencoderKL params
- ``config.t5_ckpt``: local HF dir for the T5 encoder + tokenizer

Usage: ``python -m latte_tpu.sample.sample_t2x --config
configs/t2x/t2v_sample.yaml``
"""

from __future__ import annotations

import argparse
import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.config import Config, load_config
from latte_tpu.core.scheduler import get_scheduler
from latte_tpu.models.t2v import LatteT2V
from latte_tpu.sample.pipeline_t2v import LattePipeline
from latte_tpu.utils import create_logger, save_image, save_video


def build_transformer(config, logger):
    video_length = int(getattr(config, "video_length", 16))
    image_size = config.image_size
    if isinstance(image_size, (list, tuple)):
        image_size = int(image_size[0])
    sample_size = int(image_size) // 8
    dtype = jnp.bfloat16 if getattr(config, "use_fp16", False) else jnp.float32
    on_tpu = jax.default_backend() == "tpu"
    # architecture defaults match the published Latte-1 transformer;
    # overridable for smaller variants / smoke tests
    model = LatteT2V(
        num_attention_heads=int(getattr(config, "num_attention_heads", 16)),
        attention_head_dim=int(getattr(config, "attention_head_dim", 72)),
        num_layers=int(getattr(config, "num_layers", 28)),
        caption_channels=int(getattr(config, "caption_channels", 4096)),
        cross_attention_dim=int(getattr(config, "cross_attention_dim", 1152)),
        video_length=video_length,
        sample_size=sample_size,
        enable_temporal_attentions=bool(
            getattr(config, "enable_temporal_attentions", True)
        ),
        attention_mode="auto" if on_tpu else "xla",
        unroll_blocks=on_tpu,
        # MoE serving (models/moe.py): checkpoints trained with
        # moe_experts carry expert-stacked FF weights
        moe_experts=int(getattr(config, "moe_experts", 0) or 0),
        moe_top_k=int(getattr(config, "moe_top_k", 2) or 2),
        moe_capacity_factor=float(
            getattr(config, "moe_capacity_factor", 1.25) or 1.25
        ),
        dtype=dtype,
    )
    ckpt = getattr(config, "ckpt", None)
    if ckpt and os.path.exists(str(ckpt)):
        from latte_tpu.tools.convert_t2v import load_t2v_checkpoint

        params = {
            "params": jax.tree_util.tree_map(
                jnp.asarray, load_t2v_checkpoint(str(ckpt), model.num_layers)
            )
        }
        logger.info(f"loaded LatteT2V from {ckpt}")
    else:
        logger.info("WARNING: no T2V checkpoint — random init (smoke mode)")
        ctx = jnp.zeros((1, 120, model.caption_channels))
        params = jax.jit(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 4, video_length, sample_size, sample_size)),
                jnp.zeros((1,), jnp.int32),
                ctx,
                None,
            )
        )()
    # W8A8 int8 serving (`quantized: true`) — same knob as sample.py
    if bool(getattr(config, "quantized", False)):
        from latte_tpu.quant import quantize_params

        model = model.clone(quantized=True)
        params = {"params": quantize_params(params["params"])}
        logger.info("serving with W8A8 int8 block matmuls")
    return model, params


def build_text_encoder(config, logger):
    t5_ckpt = getattr(config, "t5_ckpt", None)
    if t5_ckpt and os.path.isdir(str(t5_ckpt)):
        from latte_tpu.text import T5TextEncoder

        logger.info(f"loading T5 from {t5_ckpt}")
        return T5TextEncoder.from_pretrained(str(t5_ckpt))
    logger.info("WARNING: no T5 checkpoint — using hash-embedding stub")

    class _Stub:
        def __init__(self, dim, max_length=120):
            self.dim, self.max_length = dim, max_length

        def _embed(self, prompts):
            f = np.zeros((len(prompts), self.max_length, self.dim), np.float32)
            m = np.zeros((len(prompts), self.max_length), np.int32)
            for i, p in enumerate(prompts):
                for j, w in enumerate(p.split()[: self.max_length]):
                    rng = np.random.default_rng(zlib.crc32(w.encode()) % 2**31)
                    f[i, j] = rng.standard_normal(self.dim) * 0.02
                    m[i, j] = 1
            return jnp.asarray(f), jnp.asarray(m)

        def encode_with_negative(self, prompts, negative_prompt="", clean=True):
            c, cm = self._embed(prompts)
            u, um = self._embed([negative_prompt] * len(prompts))
            return c, cm, u, um

    return _Stub(dim=int(getattr(config, "caption_channels", 4096)))


def build_vae(config, logger):
    vae_ckpt = getattr(config, "vae_ckpt", None)
    from latte_tpu.vae import AutoencoderKL

    vae = AutoencoderKL()
    if vae_ckpt and os.path.exists(str(vae_ckpt)):
        import orbax.checkpoint as ocp

        params = {"params": ocp.PyTreeCheckpointer().restore(os.path.abspath(str(vae_ckpt)))}
        logger.info(f"loaded VAE from {vae_ckpt}")
        return vae, params
    logger.info("WARNING: no VAE checkpoint — outputs will be latents")
    return None, None


def main(config: Config) -> str:
    logger = create_logger()
    model, params = build_transformer(config, logger)
    text_encoder = build_text_encoder(config, logger)
    vae, vae_params = build_vae(config, logger)

    scheduler = get_scheduler(
        str(getattr(config, "sample_method", "DDIM")),
        beta_start=float(getattr(config, "beta_start", 0.0001)),
        beta_end=float(getattr(config, "beta_end", 0.02)),
        beta_schedule=str(getattr(config, "beta_schedule", "linear")),
    )

    # pipeline_parallel: N depth-shards the transformer over N chips —
    # serving checkpoints whose transformer exceeds one chip's HBM
    # (dist/pipeline.pipelined_t2v_forward)
    pp = int(getattr(config, "pipeline_parallel", 1) or 1)
    pp_mesh = None
    if pp > 1:
        from latte_tpu.dist.mesh import MeshConfig, make_mesh

        # exactly pp chips: a dp>1 mesh here would replicate the whole
        # denoise loop per dp group (the batch is not dp-sharded in this
        # single-prompt loop), and pp need not divide the host's chip count
        assert len(jax.devices()) >= pp, (
            f"pipeline_parallel={pp} needs {pp} devices, "
            f"have {len(jax.devices())}"
        )
        pp_mesh = make_mesh(
            MeshConfig(dp=1, pp=pp), devices=jax.devices()[:pp]
        )
        logger.info(f"pipeline-parallel serving: pp={pp}")
    pipeline = LattePipeline(
        transformer=model,
        transformer_params=params,
        scheduler=scheduler,
        text_encoder=text_encoder,
        vae=vae,
        vae_params=vae_params,
        pp_mesh=pp_mesh,
        pp_microbatches=int(getattr(config, "pp_microbatches", 2) or 2),
        block_cache_interval=int(getattr(config, "block_cache_interval", 0) or 0),
        block_cache_pairs=getattr(config, "block_cache_pairs", None),
    )

    image_size = config.image_size
    if isinstance(image_size, (list, tuple)):
        h, w = int(image_size[0]), int(image_size[1])
    else:
        h = w = int(image_size)
    video_length = int(getattr(config, "video_length", 16))
    prompts = getattr(config, "text_prompt", ["a beautiful sunset"])
    if isinstance(prompts, str):
        prompts = [prompts]  # a scalar string would explode into characters
    prompts = list(prompts)

    out_dir = str(getattr(config, "save_video_path", "./sample_videos/t2v"))
    os.makedirs(out_dir, exist_ok=True)
    for i, prompt in enumerate(prompts):
        out = pipeline(
            prompt,
            video_length=video_length,
            height=h,
            width=w,
            num_inference_steps=int(getattr(config, "num_sampling_steps", 50)),
            guidance_scale=float(getattr(config, "guidance_scale", 7.5)),
            seed=int(getattr(config, "seed", 0) or 0) + i,
            enable_temporal_attentions=bool(
                getattr(config, "enable_temporal_attentions", True)
            ),
            enable_vae_temporal_decoder=bool(
                getattr(config, "enable_vae_temporal_decoder", False)
            ),
            output_type="video" if vae is not None else "latents",
        )
        tag = prompt.replace(" ", "_")[:40]
        if vae is None:
            np.savez(os.path.join(out_dir, f"{i:02d}_{tag}.npz"), latents=out.video)
        elif video_length == 1:
            save_image(
                os.path.join(out_dir, f"{i:02d}_{tag}.png"),
                (out.video[0, 0] * 255).astype(np.uint8),
            )
        else:
            save_video(
                os.path.join(out_dir, f"{i:02d}_{tag}.mp4"),
                (out.video[0] * 255).astype(np.uint8),
                fps=8,
            )
        logger.info(f"[{i + 1}/{len(prompts)}] {prompt!r} done")
    return out_dir


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("overrides", nargs="*")
    a = p.parse_args()
    main(load_config(a.config, a.overrides))


if __name__ == "__main__":
    cli()
