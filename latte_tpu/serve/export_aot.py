"""CLI: build an AOT serving artifact from a sampling config.

Usage::

    python -m latte_tpu.serve.export_aot --config configs/ffs/ffs_sample.yaml \
        --out ffs_xl.ltpu-aot [--batch 4] [--platforms tpu,cpu] [key=value ...]

Weights are NOT embedded (see `latte_tpu/serve/aot.py`): parameter
shapes/dtypes come from `jax.eval_shape` of the model init — the export
never materializes weights, and any ``ckpt`` in the config is ignored
here (it is supplied at call time on the serving host).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from latte_tpu.config import load_config
from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_models
from latte_tpu.serve.aot import AOT_SUFFIX, export_sampler, save_sampler
from latte_tpu.utils import create_logger


def main(config, out: str, batch: int = 1, platforms=None, tensor_parallel=None) -> str:
    logger = create_logger(None)
    model = get_models(config)
    frames = int(getattr(config, "num_frames", 16))
    # same latent/channel derivation as export_sampler and sample.py main
    latent = int(
        getattr(config, "latent_size", 0)
        or int(getattr(config, "image_size", 256)) // 8
    )
    extras = int(getattr(config, "extras", 1))
    in_ch = int(getattr(config, "in_channels", 4))

    x = jnp.zeros((1, frames, in_ch, latent, latent), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    init_kw = {"y": jnp.zeros((1,), jnp.int32)} if extras == 2 else {}
    rngs = {"params": jax.random.PRNGKey(0)}
    if extras == 2:
        rngs["label_dropout"] = jax.random.PRNGKey(1)
    params_shapes = jax.eval_shape(lambda: model.init(rngs, x, t, **init_kw))

    diffusion = create_diffusion(
        str(getattr(config, "num_sampling_steps", 250)),
        diffusion_steps=int(getattr(config, "diffusion_steps", 1000)),
    )
    tp = int(
        tensor_parallel
        if tensor_parallel is not None
        else getattr(config, "tensor_parallel", 1) or 1
    )
    bc = None
    bc_n = int(getattr(config, "block_cache_interval", 0) or 0)
    if bc_n > 1:
        n_pairs = model.depth // 2
        bc_k = int(getattr(config, "block_cache_pairs", 0) or (n_pairs * 2) // 3)
        bc = (bc_k, bc_n)
    exported, header = export_sampler(
        model, config, diffusion, params_shapes, batch=batch,
        platforms=platforms, tensor_parallel=tp, block_cache=bc,
    )
    if not out.endswith(AOT_SUFFIX):
        out += AOT_SUFFIX
    save_sampler(out, exported, header)
    logger.info(f"exported {header['model']} sampler -> {out} ({header})")
    return out


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument(
        "--tensor_parallel", type=int, default=None,
        help="export a tp=N sharded trajectory (defaults to the config key)",
    )
    p.add_argument("overrides", nargs="*")
    a = p.parse_args()
    main(
        load_config(a.config, a.overrides),
        a.out,
        batch=a.batch,
        platforms=[s.strip() for s in a.platforms.split(",") if s.strip()],
        tensor_parallel=a.tensor_parallel,
    )


if __name__ == "__main__":
    cli()
