"""Metric-input datasets: frame folders or mp4 directories.

Capability parity with `/root/reference/tools/utils/dataset.py:260-497`
(`VideoFramesFolderDataset`): each clip is a subdirectory of frames (or an
mp4); loading takes N consecutive frames at a random offset with an
optional subsample factor (`dataset.py:398-427`).
"""

from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np

from latte_tpu.data.datasets import IMG_EXTS, VIDEO_EXTS, _numeric_key, _walk_files
from latte_tpu.utils import read_video


class MetricVideoDataset:
    """Yields uint8 (F, H, W, 3) clips for metric feature extraction."""

    def __init__(
        self,
        path: str,
        num_frames: int,
        subsample_factor: int = 1,
        max_items: Optional[int] = None,
        seed: int = 0,
    ):
        self.num_frames = num_frames
        self.subsample_factor = subsample_factor
        self.rng = random.Random(seed)

        self.clips: List = []
        # frame-folder layout
        for dirpath, dirnames, files in os.walk(path, followlinks=True):
            imgs = sorted(
                (f for f in files if f.lower().endswith(IMG_EXTS)), key=_numeric_key
            )
            if imgs:
                self.clips.append(("frames", [os.path.join(dirpath, f) for f in imgs]))
        # flat mp4 layout
        for v in _walk_files(path, VIDEO_EXTS):
            self.clips.append(("video", v))
        if not self.clips:
            raise FileNotFoundError(f"no clips under {path}")
        self.clips.sort(key=lambda c: c[1] if isinstance(c[1], str) else c[1][0])
        if max_items is not None and len(self.clips) > max_items:
            idx = self.rng.sample(range(len(self.clips)), max_items)
            self.clips = [self.clips[i] for i in sorted(idx)]

    def __len__(self) -> int:
        return len(self.clips)

    def __getitem__(self, index: int) -> np.ndarray:
        kind, src = self.clips[index]
        span = self.num_frames * self.subsample_factor
        if kind == "video":
            frames = read_video(src)
        else:
            import cv2

            total = len(src)
            offset = self.rng.randint(0, max(0, total - span))
            chosen = src[offset : offset + span]
            frames = np.stack([cv2.imread(f)[:, :, ::-1] for f in chosen])
            clip = frames[:: self.subsample_factor][: self.num_frames]
            return self._pad(clip)
        total = len(frames)
        offset = self.rng.randint(0, max(0, total - span))
        clip = frames[offset : offset + span : self.subsample_factor][: self.num_frames]
        return self._pad(clip)

    def _pad(self, clip: np.ndarray) -> np.ndarray:
        if len(clip) < self.num_frames:
            pad = np.repeat(clip[-1:], self.num_frames - len(clip), axis=0)
            clip = np.concatenate([clip, pad], axis=0)
        return clip
