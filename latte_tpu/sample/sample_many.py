"""Data-parallel batch sampling for FVD evaluation.

TPU-native equivalent of `/root/reference/sample/sample_ddp.py:51-199`:
instead of NCCL ranks, the batch is sharded over the ``dp`` axis of a
`jax.sharding.Mesh`, one jitted program serves all chips, and output files
keep the reference's interleaved global indexing (`sample_ddp.py:171-176`)
so directory layouts are comparable. Per-shard determinism follows the
reference's per-rank seeding: fold (seed, shard index) into the key.
"""

from __future__ import annotations

import argparse
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.config import Config, load_config
from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.core.samplers import ddim_sample_loop, p_sample_loop
from latte_tpu.dist.mesh import MeshConfig, make_mesh, replicate
from latte_tpu.models import get_models
from latte_tpu.sample.sample import build_sample_fn, load_vae
from latte_tpu.train.checkpoint import find_model
from latte_tpu.utils import create_logger, save_video, to_uint8


def main(config: Config) -> str:
    logger = create_logger()
    dtype = jnp.bfloat16 if getattr(config, "use_fp16", False) else jnp.float32
    model = get_models(config)
    if dtype != jnp.float32:
        model = model.clone(dtype=dtype)

    n_dev = jax.device_count()
    mesh = make_mesh(MeshConfig(dp=n_dev, tp=1))
    per_dev = int(getattr(config, "per_proc_batch_size", 2))
    global_batch = per_dev * n_dev
    total = int(getattr(config, "num_fvd_samples", 2048))
    total = int(math.ceil(total / global_batch) * global_batch)
    iterations = total // global_batch
    logger.info(
        f"sampling {total} videos on {n_dev} devices "
        f"({per_dev}/device/iter, {iterations} iterations)"
    )

    latent = int(config.image_size) // 8
    frames = int(getattr(config, "num_frames", 16))
    seed = int(getattr(config, "seed", 0))

    ckpt = getattr(config, "ckpt", None)
    if ckpt and os.path.exists(ckpt):
        params_tree = find_model(ckpt, depth=model.depth, num_heads=model.num_heads)
        params = {"params": jax.tree_util.tree_map(jnp.asarray, params_tree)}
    else:
        x0 = jnp.zeros((1, frames, 4, latent, latent))
        init_rngs = {"params": jax.random.PRNGKey(0)}
        kw = {}
        if int(getattr(config, "extras", 1)) == 2:
            init_rngs["label_dropout"] = jax.random.PRNGKey(1)
            kw["y"] = jnp.zeros((1,), jnp.int32)
        params = jax.jit(
            lambda: model.init(init_rngs, x0, jnp.zeros((1,), jnp.int32), **kw)
        )()
        logger.info("WARNING: no checkpoint — random init")

    diffusion = create_diffusion(str(config.num_sampling_steps))
    sample_fn, use_cfg = build_sample_fn(model, params, config, diffusion)

    out_dir = getattr(config, "save_video_path", "./sampled_videos")
    os.makedirs(out_dir, exist_ok=True)
    vae, vae_params = load_vae(config)
    decode = None
    if vae is not None:
        decode_impl = jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode))
        decode = lambda zz: decode_impl(vae_params, zz)

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P("dp"))
    with mesh:
        params = replicate(mesh, params)
        for it in range(iterations):
            # per-(iteration, shard) deterministic keys, reference-style
            # seed partitioning (`sample_ddp.py:63-65`)
            keys = jnp.stack(
                [
                    jax.random.fold_in(jax.random.PRNGKey(seed), it * n_dev + s)
                    for s in range(n_dev)
                ]
            )
            z = jnp.concatenate(
                [
                    jax.random.normal(
                        keys[s], (per_dev, frames, 4, latent, latent), jnp.float32
                    )
                    for s in range(n_dev)
                ]
            )
            z = jax.device_put(z, batch_sharding)
            y = None
            if int(getattr(config, "extras", 1)) == 2:
                y = jax.random.randint(
                    jax.random.fold_in(jax.random.PRNGKey(seed + 1), it),
                    (global_batch,),
                    0,
                    model.num_classes,
                    dtype=jnp.int32,
                )
                if use_cfg:
                    z = jnp.concatenate([z, z], axis=0)
                    y = jnp.concatenate(
                        [y, jnp.full((global_batch,), model.num_classes, jnp.int32)]
                    )
            latents = sample_fn(z, y, jax.random.fold_in(jax.random.PRNGKey(seed + 2), it))
            latents = jax.block_until_ready(latents)[:global_batch]

            host = np.asarray(latents)
            for b in range(global_batch):
                # interleaved global index: iteration-major, shard-minor
                idx = it * global_batch + b
                if decode is not None:
                    f = host[b : b + 1] / 0.18215
                    flat = f.reshape(frames, *f.shape[2:])
                    vid = np.asarray(decode(jnp.asarray(flat)))
                    vid = vid.transpose(0, 2, 3, 1)
                    save_video(
                        os.path.join(out_dir, f"{idx:04d}.mp4"), to_uint8(vid), fps=8
                    )
                else:
                    np.savez(
                        os.path.join(out_dir, f"{idx:04d}.npz"), latents=host[b]
                    )
            logger.info(f"iteration {it + 1}/{iterations} done")
    return out_dir




def create_npz_from_sample_folder(sample_dir: str, num: int = 2048) -> str:
    """Bundle generated samples into one .npz (reference
    `sample_ddp.py:34-48` helper used for image-metric tooling)."""
    import glob

    from latte_tpu.utils import read_video

    samples = []
    files = sorted(glob.glob(os.path.join(sample_dir, "*.mp4")))[:num]
    if files:
        for fpath in files:
            samples.append(read_video(fpath))
    else:
        for fpath in sorted(glob.glob(os.path.join(sample_dir, "*.npz")))[:num]:
            samples.append(np.load(fpath)["latents"])
    arr = np.stack(samples)
    out = os.path.join(sample_dir, f"samples_{len(arr)}.npz")
    np.savez(out, arr_0=arr)
    return out


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save_video_path", default=None)
    p.add_argument("overrides", nargs="*")
    a = p.parse_args()
    cfg = load_config(a.config, a.overrides)
    if a.ckpt:
        cfg.ckpt = a.ckpt
    if a.save_video_path:
        cfg.save_video_path = a.save_video_path
    main(cfg)


if __name__ == "__main__":
    cli()
