"""Encode a video dataset to a latent cache (one-time offline pass).

Usage::

    python -m latte_tpu.tools.cache_latents --config configs/ffs/ffs_train.yaml \
        [--out /path/to/cache] [overrides...]

Walks the config's dataset deterministically (no shuffle), VAE-encodes each
clip on-device in batches, and writes per-item ``.npz`` files holding the
posterior MOMENTS (mean, std) plus labels, with a ``latent_cache.json``
metadata file. Point the train config's ``data_path`` at the cache dir and
`latte_tpu.train.train` trains from latents directly — the per-step VAE
encode (a measured ~17% tax on real-data XL training) disappears while the
training distribution stays identical, because the train step still draws a
fresh posterior sample from the cached moments each visit
(`latte_tpu/train/step.py`).

Fills the role the reference performs per-step at
`/root/reference/train.py:206-211`.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(config, out_dir: str) -> str:
    import jax
    import jax.numpy as jnp

    from latte_tpu.data import get_dataset
    from latte_tpu.train.train import build_encode_fn_raw

    dataset = get_dataset(config)
    encode, vae_params = build_encode_fn_raw(config)
    os.makedirs(out_dir, exist_ok=True)

    batch = int(getattr(config, "cache_batch_size", 8) or 8)
    extras = int(getattr(config, "extras", 1))

    @jax.jit
    def encode_batch(video, params):
        # (N, F, 3, H, W) fp32 in [-1, 1] -> posterior moments, frame axis
        # folded into batch like the train step's fused encode
        N, F = video.shape[:2]
        flat = video.reshape(N * F, *video.shape[2:])
        post = encode(flat, params)
        mean = post.mean.reshape(N, F, *post.mean.shape[1:])
        std = post.std.reshape(N, F, *post.std.shape[1:])
        return mean, std

    n = len(dataset)
    if n == 0:
        raise ValueError(
            f"dataset {getattr(config, 'data_path', '?')!r} yielded 0 items "
            "— refusing to write an empty latent cache"
        )
    meta = None
    for lo in range(0, n, batch):
        items = [dataset[i] for i in range(lo, min(lo + batch, n))]
        video = np.stack([np.asarray(s["video"], np.float32) for s in items])
        mean, std = encode_batch(jnp.asarray(video), vae_params)
        mean, std = np.asarray(mean, np.float32), np.asarray(std, np.float32)
        for j, s in enumerate(items):
            rec = {"latent_mean": mean[j], "latent_std": std[j]}
            if "y" in s:
                rec["y"] = np.asarray(s["y"], np.int32)
            if "y_image" in s:
                rec["y_image"] = np.asarray(s["y_image"], np.int32)
            np.savez(os.path.join(out_dir, f"{lo + j:06d}.npz"), **rec)
        if meta is None:
            meta = {
                "num_items": n,
                "frames": int(mean.shape[1]),
                "latent_shape": list(mean.shape[2:]),
                "vae_scale": float(getattr(config, "vae_scale", 0.18215)),
                "dataset": str(getattr(config, "dataset", "")),
                "extras": extras,
            }
        print(f"cached {min(lo + batch, n)}/{n}", flush=True)
    with open(os.path.join(out_dir, "latent_cache.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"latent cache written to {out_dir} ({n} items)")
    return out_dir


def cli():
    from latte_tpu.config import load_config

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--out", default=None, help="cache dir (default: <data_path>_latents)")
    p.add_argument("overrides", nargs="*")
    a = p.parse_args()
    config = load_config(a.config, a.overrides)
    out = a.out or (str(config.data_path).rstrip("/") + "_latents")
    main(config, out)


if __name__ == "__main__":
    cli()
