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


class BatchGenerator:
    """One jitted data-parallel sampling program behind a ``gen_fn`` —
    callable both by :func:`main` (which writes files) and DIRECTLY by the
    metric stack (``opts["fake_gen"]``) so FVD can stream features without
    writing 2048 mp4s (reference generator-side stats,
    `tools/metrics/metric_utils.py:262-321`).

    Each call produces one iteration's global batch; per-(iteration, shard)
    rng keys follow the reference's per-rank seed partitioning
    (`sample_ddp.py:63-65`).
    """

    def __init__(self, config, logger=None):
        self.config = config
        dtype = jnp.bfloat16 if getattr(config, "use_fp16", False) else jnp.float32
        model = get_models(config)
        if dtype != jnp.float32:
            model = model.clone(dtype=dtype)
        self.model = model

        self.n_dev = jax.device_count()
        self.mesh = make_mesh(MeshConfig(dp=self.n_dev, tp=1))
        self.per_dev = int(getattr(config, "per_proc_batch_size", 2))
        self.global_batch = self.per_dev * self.n_dev
        # honor latent_size overrides like registry/sample.py/train.py do
        self.latent = int(
            getattr(config, "latent_size", 0) or int(config.image_size) // 8
        )
        self.frames = int(getattr(config, "num_frames", 16))
        self.seed = int(getattr(config, "seed", 0))
        self.it = 0

        ckpt = getattr(config, "ckpt", None)
        if ckpt and os.path.exists(ckpt):
            # `prefer_ema: false` -> raw params (short runs where the EMA
            # hasn't converged); see sample.py for the rationale
            params_tree = find_model(
                ckpt, depth=model.depth, num_heads=model.num_heads,
                prefer_ema=bool(getattr(config, "prefer_ema", True)),
            )
            params = {"params": jax.tree_util.tree_map(jnp.asarray, params_tree)}
        else:
            x0 = jnp.zeros((1, self.frames, 4, self.latent, self.latent))
            init_rngs = {"params": jax.random.PRNGKey(0)}
            kw = {}
            if int(getattr(config, "extras", 1)) == 2:
                init_rngs["label_dropout"] = jax.random.PRNGKey(1)
                kw["y"] = jnp.zeros((1,), jnp.int32)
            params = jax.jit(
                lambda: model.init(init_rngs, x0, jnp.zeros((1,), jnp.int32), **kw)
            )()
            if logger:
                logger.info("WARNING: no checkpoint — random init")

        diffusion = create_diffusion(str(config.num_sampling_steps))
        # replicate FIRST so the jitted sampler closes over the mesh-
        # replicated tree — building it over the device-0-committed params
        # would broadcast from one chip every call and hold the weights
        # in HBM twice
        with self.mesh:
            self.params = replicate(self.mesh, params)
        self.sample_fn, self.use_cfg = build_sample_fn(
            # allow_tp=False: this generator owns the full-device dp mesh;
            # a config-carried tensor_parallel must not pin the sampler
            # to a conflicting tp submesh
            model, self.params, config, diffusion, allow_tp=False
        )

        vae, vae_params = load_vae(config)
        self.decode = None
        if vae is not None:
            from latte_tpu.vae import make_decode_fn

            self.decode = make_decode_fn(vae, vae_params)

    def sample_latents(self) -> np.ndarray:
        """One global batch of latents, (global_batch, F, 4, h, w) fp32."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        it, seed, n_dev = self.it, self.seed, self.n_dev
        with self.mesh:
            keys = [
                jax.random.fold_in(jax.random.PRNGKey(seed), it * n_dev + s)
                for s in range(n_dev)
            ]
            z = jnp.concatenate(
                [
                    jax.random.normal(
                        k, (self.per_dev, self.frames, 4, self.latent, self.latent),
                        jnp.float32,
                    )
                    for k in keys
                ]
            )
            z = jax.device_put(z, NamedSharding(self.mesh, P("dp")))
            y = None
            if int(getattr(self.config, "extras", 1)) == 2:
                y = jax.random.randint(
                    jax.random.fold_in(jax.random.PRNGKey(seed + 1), it),
                    (self.global_batch,), 0, self.model.num_classes, dtype=jnp.int32,
                )
                if self.use_cfg:
                    z = jnp.concatenate([z, z], axis=0)
                    y = jnp.concatenate(
                        [y, jnp.full((self.global_batch,), self.model.num_classes, jnp.int32)]
                    )
            latents = self.sample_fn(
                z, y, jax.random.fold_in(jax.random.PRNGKey(seed + 2), it)
            )
            latents = jax.block_until_ready(latents)[: self.global_batch]
        self.it += 1
        return np.asarray(latents)

    def decode_to_uint8(self, host: np.ndarray) -> np.ndarray:
        """(B, F, 4, h, w) latents -> uint8 (B, F, H, W, 3) video."""
        assert self.decode is not None, "generator built without a VAE"
        out = []
        for b in range(host.shape[0]):
            f = host[b : b + 1] / 0.18215
            flat = f.reshape(self.frames, *f.shape[2:])
            vid = np.asarray(self.decode(jnp.asarray(flat))).transpose(0, 2, 3, 1)
            out.append(to_uint8(vid))
        return np.stack(out)

    def __call__(self, n: int = 0) -> np.ndarray:
        """gen_fn protocol for `eval.metrics.generator_stats`: one global
        batch of uint8 clips per call (``n`` is advisory)."""
        return self.decode_to_uint8(self.sample_latents())


def main(config: Config) -> str:
    logger = create_logger()
    gen = BatchGenerator(config, logger=logger)
    global_batch, per_dev, n_dev = gen.global_batch, gen.per_dev, gen.n_dev
    total = int(getattr(config, "num_fvd_samples", 2048))
    total = int(math.ceil(total / global_batch) * global_batch)
    iterations = total // global_batch
    logger.info(
        f"sampling {total} videos on {n_dev} devices "
        f"({per_dev}/device/iter, {iterations} iterations)"
    )

    out_dir = getattr(config, "save_video_path", "./sampled_videos")
    os.makedirs(out_dir, exist_ok=True)
    for it in range(iterations):
        host = gen.sample_latents()
        for b in range(global_batch):
            # reference interleave (`sample_ddp.py:171-176`:
            # i*world + rank + total): rank-minor, position-major —
            # our host layout is shard-major, so b = s*per_dev + p
            s, p = divmod(b, per_dev)
            idx = it * global_batch + p * n_dev + s
            if gen.decode is not None:
                vid = gen.decode_to_uint8(host[b : b + 1])[0]
                save_video(os.path.join(out_dir, f"{idx:04d}.mp4"), vid, fps=8)
            else:
                np.savez(os.path.join(out_dir, f"{idx:04d}.npz"), latents=host[b])
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
