"""Feature detectors for evaluation metrics.

The reference auto-downloads three torchscript detectors (SURVEY.md §2.9):
I3D Kinetics-400 (FVD), Inception-2015 (FID/KID/IS), C3D-UCF101 (video
IS). This environment has no network egress, so detectors load from a
local directory (``LATTE_TPU_DETECTORS`` env var or an explicit path) and
run on torch-CPU for exact protocol parity; metrics also accept any
injected callable (used by tests and by Flax re-implementations).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

DETECTOR_FILES = {
    "i3d": "i3d_torchscript.pt",
    "inception": "inception-2015-12-05.pt",
    "c3d": "c3d_ucf101.pt",
}


def detectors_dir() -> Optional[str]:
    return os.environ.get("LATTE_TPU_DETECTORS")


def load_torchscript_detector(name: str, path: Optional[str] = None) -> Callable:
    """Load a torchscript detector; returns a numpy-in/numpy-out callable."""
    import torch

    if path is None:
        d = detectors_dir()
        if d is None:
            raise FileNotFoundError(
                f"detector {name!r} unavailable: set LATTE_TPU_DETECTORS to a "
                f"directory containing {DETECTOR_FILES[name]} (the reference "
                "auto-downloads it; this environment has no egress)"
            )
        path = os.path.join(d, DETECTOR_FILES[name])
    model = torch.jit.load(path).eval()

    def run(x: np.ndarray, **kwargs) -> np.ndarray:
        with torch.no_grad():
            out = model(torch.from_numpy(np.ascontiguousarray(x)), **kwargs)
        return out.numpy()

    return run


def i3d_features(detector: Callable, videos: np.ndarray) -> np.ndarray:
    """(B, F, H, W, 3) uint8 -> I3D logits/features (B, 400).

    StyleGAN-V's torchscript I3D takes (B, C, F, H, W) float and rescales
    internally when passed the canonical kwargs.
    """
    x = videos.astype(np.float32).transpose(0, 4, 1, 2, 3)
    return detector(x, rescale=True, resize=True, return_features=True)


def inception_features(detector: Callable, images: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 -> pool3 features (B, 2048)."""
    x = images.transpose(0, 3, 1, 2)
    return detector(x, return_features=True)


def c3d_probs(detector: Callable, videos: np.ndarray) -> np.ndarray:
    """(B, F, H, W, 3) uint8 -> class probabilities (B, 101)."""
    x = videos.astype(np.float32).transpose(0, 4, 1, 2, 3)
    return detector(x)
