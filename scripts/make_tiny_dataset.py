"""Generate a tiny on-disk FaceForensics-style mp4 dataset for training runs.

The reference's FFS loader walks a folder of mp4 files
(`/root/reference/datasets/ffs_datasets.py:124-160`); this writes N short
synthetic clips (moving colored gradients — cheap to generate, non-constant
so the VAE encode and transforms see real variation) so the full
DataLoader -> video_transforms -> fused-VAE-encode train path can run
sustained on-chip without egress.

Usage: python scripts/make_tiny_dataset.py --out /tmp/tiny_ffs --n 16 \
           --frames 64 --size 256
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latte_tpu.utils import save_video


def make_clip(seed: int, frames: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    phase = rng.uniform(0, 2 * np.pi, size=(3,))
    freq = rng.uniform(2, 6, size=(3,))
    speed = rng.uniform(0.5, 2.0, size=(3,))
    t = np.arange(frames, dtype=np.float32)[:, None, None] / frames
    video = np.stack(
        [
            0.5 + 0.5 * np.sin(2 * np.pi * (freq[c] * (xx + yy) / 2 + speed[c] * t) + phase[c])
            for c in range(3)
        ],
        axis=-1,
    )  # (F, H, W, 3) in [0, 1]
    noise = rng.normal(0, 0.03, size=video.shape).astype(np.float32)
    return np.clip((video + noise) * 255, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for i in range(args.n):
        path = os.path.join(args.out, f"clip_{i:03d}.mp4")
        save_video(path, make_clip(i, args.frames, args.size))
        print(path)


if __name__ == "__main__":
    main()
