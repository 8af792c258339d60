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
    "make_reference_transform",
    "TemporalRandomCrop",
    "Compose",
]


def to_tensor_video(video: np.ndarray) -> np.ndarray:
    """(F, H, W, C) uint8 — or float32 in [0, 255] (post-resize) —
    -> float32 (F, C, H, W) in [0, 1]."""
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
    """Bilinear resize every frame of (F, H, W, C) to (h, w).

    Interpolates in float32 (the reference resizes AFTER /255 in float;
    resizing in uint8 would quantize every output pixel)."""
    import cv2

    h, w = size
    v = video.astype(np.float32)
    return np.stack(
        [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in v]
    )


def resize_scale(video: np.ndarray, target: int) -> np.ndarray:
    """Scale so the SHORTER side equals ``target`` (aspect preserved).

    The longer side uses floor(dim * scale), matching torch interpolate's
    scale_factor semantics (`video_transforms.py:52-57` of the reference);
    the shorter side is pinned to ``target`` exactly — a naive
    floor(min * (target/min)) lands on target-1 for ~12% of source sizes
    (fp rounding), which would crash the downstream center crop."""
    _, H, W, _ = video.shape
    scale = target / min(H, W)
    if H <= W:
        nh, nw = target, max(target, int(W * scale))
    else:
        nh, nw = max(target, int(H * scale)), target
    return resize(video, (nh, nw))


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


def make_reference_transform(dataset: str, image_size: int):
    """Per-dataset transform stack matching the reference table exactly
    (`/root/reference/datasets/__init__.py:13-79`):

    - ffs / ucf101 (+ ``_img``): random horizontal flip, then UCF
      scale-shorter-side-then-center-crop
    - taichi (+ ``_img``): random horizontal flip only — NO spatial crop
    - sky (+ ``_img``): center-crop-largest-square-then-resize — NO flip
      (the reference comments the flip out)

    Returns ``transform(video_uint8_FHWC, rng) -> float32 (F, C, H, W)
    in [-1, 1]``; the flip draw comes from ``rng`` so loader workers can
    be seeded independently.
    """
    base = dataset.replace("_img", "")
    if base not in ("ffs", "ucf101", "taichi", "sky"):
        raise NotImplementedError(dataset)

    def transform(video: np.ndarray, rng: Optional[random.Random] = None) -> np.ndarray:
        if base in ("ffs", "ucf101"):
            video = random_horizontal_flip(video, rng=rng)
            video = ucf_center_crop(video, image_size)
        elif base == "taichi":
            video = random_horizontal_flip(video, rng=rng)
        else:  # sky
            video = center_crop_resize(video, image_size)
        return normalize_video(to_tensor_video(video))

    return transform


class TemporalRandomCrop:
    """Random contiguous window of length ``size`` over the frame axis
    (reference `video_transforms.py:413-427`: begin drawn from
    [0, total - size - 1])."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, total_frames: int, rng: Optional[random.Random] = None) -> Tuple[int, int]:
        r = rng or random
        rand_end = max(0, total_frames - self.size - 1)
        begin = r.randint(0, rand_end)
        return begin, min(begin + self.size, total_frames)


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, video: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            video = t(video)
        return video
