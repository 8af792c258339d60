"""Video transforms (numpy/OpenCV, host-side).

Capability parity with `/root/reference/datasets/video_transforms.py`
(ToTensorVideo `:364-383`, RandomHorizontalFlipVideo `:386-408`,
UCFCenterCropVideo scale-then-crop `:249-282`, CenterCropResizeVideo
crop-then-resize `:214-247`, TemporalRandomCrop `:413-427`), re-designed as
pure functions over uint8 (F, H, W, C) numpy frames — the TPU input
pipeline stays host-side numpy until one `device_put` per batch.

Output convention: float32 (F, C, H, W) in [-1, 1].
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "to_tensor_video",
    "normalize_video",
    "random_horizontal_flip",
    "center_crop",
    "resize",
    "resize_scale",
    "ucf_center_crop",
    "center_crop_resize",
    "TemporalRandomCrop",
    "Compose",
]


def to_tensor_video(video: np.ndarray) -> np.ndarray:
    """uint8 (F, H, W, C) -> float32 (F, C, H, W) in [0, 1]."""
    assert video.dtype == np.uint8, video.dtype
    return (video.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)


def normalize_video(video: np.ndarray, mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """[0, 1] -> [-1, 1] (channel-uniform, matching the reference usage)."""
    return (video - mean) / std


def random_horizontal_flip(video: np.ndarray, p: float = 0.5, rng: Optional[random.Random] = None) -> np.ndarray:
    """Flip all frames of an (F, ..., W) clip with probability p (W last for
    HWC layout (F, H, W, C))."""
    r = (rng or random).random()
    if r < p:
        return np.ascontiguousarray(video[:, :, ::-1])
    return video


def resize(video: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize every frame of (F, H, W, C) to (h, w)."""
    import cv2

    h, w = size
    return np.stack(
        [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in video]
    )


def resize_scale(video: np.ndarray, target: int) -> np.ndarray:
    """Scale so the SHORTER side equals ``target`` (aspect preserved)."""
    _, H, W, _ = video.shape
    scale = target / min(H, W)
    return resize(video, (round(H * scale), round(W * scale)))


def center_crop(video: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    _, H, W, _ = video.shape
    th, tw = size
    assert H >= th and W >= tw, f"crop {size} larger than video {(H, W)}"
    i = int(round((H - th) / 2.0))
    j = int(round((W - tw) / 2.0))
    return video[:, i : i + th, j : j + tw]


def ucf_center_crop(video: np.ndarray, size: int) -> np.ndarray:
    """Scale shorter side to ``size`` then center crop (reference
    UCFCenterCropVideo semantics)."""
    return center_crop(resize_scale(video, size), (size, size))


def center_crop_resize(video: np.ndarray, size: int) -> np.ndarray:
    """Center crop to the largest square then resize (reference
    CenterCropResizeVideo semantics)."""
    _, H, W, _ = video.shape
    s = min(H, W)
    return resize(center_crop(video, (s, s)), (size, size))


class TemporalRandomCrop:
    """Random contiguous window of length ``size`` over the frame axis."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, total_frames: int, rng: Optional[random.Random] = None) -> Tuple[int, int]:
        r = rng or random
        begin = r.randint(0, max(0, total_frames - self.size))
        return begin, min(begin + self.size, total_frames)


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, video: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            video = t(video)
        return video
