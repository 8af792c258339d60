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


def load_detector(name: str, path: Optional[str] = None) -> Callable:
    """Load a detector honoring ``LATTE_TPU_DETECTOR_BACKEND``.

    ``torch`` (default): the torchscript graph on torch-CPU — exact
    protocol parity. ``flax``: weights converted out of the same
    torchscript file into the native Flax re-implementation, features
    extracted on-device under jit (the 2×2048-clip FVD protocol is hours
    on torch-CPU, minutes on one chip). Covers i3d (FVD), inception
    (FID/KID/IS), and c3d (video IS).
    """
    backend = os.environ.get("LATTE_TPU_DETECTOR_BACKEND", "torch")
    if backend == "flax" and name in ("i3d", "inception", "c3d"):
        import torch

        if path is None:
            d = detectors_dir()
            if d is None:
                raise FileNotFoundError(
                    "flax detector backend still needs the torchscript "
                    f"weights: set LATTE_TPU_DETECTORS to a directory with "
                    f"{DETECTOR_FILES[name]}"
                )
            path = os.path.join(d, DETECTOR_FILES[name])
        sd = torch.jit.load(path).state_dict()
        if name == "i3d":
            from latte_tpu.eval.i3d import convert_i3d_state_dict, i3d_flax_detector

            return i3d_flax_detector(convert_i3d_state_dict(sd))
        if name == "c3d":
            from latte_tpu.eval.c3d import c3d_flax_detector, convert_c3d_state_dict

            params, mean = convert_c3d_state_dict(sd)
            return c3d_flax_detector(params, mean)
        from latte_tpu.eval.inception import (
            convert_inception_state_dict,
            inception_flax_detector,
        )

        return inception_flax_detector(convert_inception_state_dict(sd))
    return load_torchscript_detector(name, path)


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


def inception_probs(detector: Callable, images: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 -> class probabilities.

    The IS protocol calls the Inception torchscript with
    ``no_output_bias=True`` — softmax probabilities matching the original
    OpenAI implementation (reference `inception_score.py:21`) — NOT the
    pool3 features FID/KID use.
    """
    x = images.transpose(0, 3, 1, 2)
    return detector(x, no_output_bias=True)


def c3d_probs(detector: Callable, videos: np.ndarray) -> np.ndarray:
    """(B, F, H, W, 3) uint8 -> class probabilities (B, 101)."""
    x = videos.astype(np.float32).transpose(0, 4, 1, 2, 3)
    return detector(x)


def standin_detector(feature_dim: int = 400, seed: int = 0) -> Callable:
    """Deterministic stand-in detector for end-to-end protocol validation.

    Egress is required to fetch the real torchscript detectors, so this
    fixed-seed random-projection feature extractor lets the FULL metric
    chain (sample -> mp4 -> frames -> dataset windowing -> fp64 streaming
    stats -> cache -> Frechet/KID/IS math -> JSONL) run and be regression-
    tested without them. The resulting numbers are protocol artifacts, NOT
    comparable to published FVD/FID — swap in the real detector via
    ``LATTE_TPU_DETECTORS`` for quality claims.

    Accepts the same call shapes the torchscript detectors do: video
    (B, C, F, H, W) or image (B, C, H, W) float arrays, ignoring the
    torchscript-specific kwargs; returns (B, feature_dim) float32 that
    depends on actual pixel content (temporal AND spatial structure), so
    protocol bugs like wrong frame windows or channel order shift it.
    """
    rng = np.random.default_rng(seed)
    grid = 8  # pooled (F, H, W) -> (grid, grid, grid)
    proj = rng.standard_normal((3 * grid**3, feature_dim)).astype(np.float64)
    proj /= np.sqrt(proj.shape[0])

    def run(x: np.ndarray, **kwargs) -> np.ndarray:
        x = np.asarray(x, np.float64)
        if x.ndim == 4:  # image: fake a single frame
            x = x[:, :, None]
        B, C, F, H, W = x.shape
        if x.max() > 2.0:  # raw 0..255 input (rescale=True semantics)
            x = x / 255.0
        fi = np.linspace(0, F - 1, grid).round().astype(int)
        hi = np.linspace(0, H - 1, grid).round().astype(int)
        wi = np.linspace(0, W - 1, grid).round().astype(int)
        sub = x[:, :, fi][:, :, :, hi][:, :, :, :, wi]  # (B, C, g, g, g)
        flat = sub.reshape(B, -1) - 0.5
        logits = flat @ proj
        if kwargs.get("return_features"):
            # feature semantics (FVD/FID/KID paths)
            return np.tanh(logits).astype(np.float32)
        # probability semantics: IS calls Inception with no_output_bias=True
        # and C3D bare — both expect softmax class probs
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return (e / e.sum(axis=1, keepdims=True)).astype(np.float32)

    return run


def get_detector(spec: str, role: str) -> Callable:
    """Resolve a CLI detector spec: 'auto' (torchscript from
    LATTE_TPU_DETECTORS), 'standin' / 'standin:<seed>', or a file path."""
    if spec in (None, "", "auto"):
        return load_torchscript_detector(role)
    if spec == "standin" or spec.startswith("standin:"):
        seed = int(spec.split(":", 1)[1]) if ":" in spec else 0
        return standin_detector(seed=seed)
    return load_torchscript_detector(role, path=spec)
