"""Framework utilities: logging, experiment dirs, video IO, caption cleaning.

Capability parity with `/root/reference/utils.py` (logger `:148-165`,
experiment-dir naming `:127-142`, `save_video_grid` `:255-272`, PixArt
caption cleaning `:314-451`), re-homed for JAX multi-host (process-0
logging via `jax.process_index()`); mp4 IO goes through OpenCV since
ffmpeg-python bindings aren't available on the image.
"""

from __future__ import annotations

import html
import logging
import math
import os
import re
import urllib.parse as ul
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "create_logger",
    "create_experiment_dir",
    "save_video",
    "read_video",
    "save_video_grid",
    "save_image",
    "clean_caption",
    "text_preprocessing",
]


def _is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover
        return True


def create_logger(logging_dir: Optional[str] = None) -> logging.Logger:
    """Rank-0 logger to stdout (+ ``log.txt`` when a dir is given)."""
    logger = logging.getLogger("latte_tpu")
    logger.handlers.clear()
    if _is_main_process():
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter(
            "[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
        )
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if logging_dir is not None:
            os.makedirs(logging_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(logging_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


def create_experiment_dir(results_dir: str, config) -> str:
    """Auto-indexed experiment dir whose name encodes key flags
    (reference `utils.py:127-142` + `train.py:70-75`)."""
    os.makedirs(results_dir, exist_ok=True)
    existing = [d for d in os.listdir(results_dir) if "-" in d and d.split("-")[0].isdigit()]
    index = max([int(d.split("-")[0]) for d in existing], default=-1) + 1
    name = str(getattr(config, "model", "model")).replace("/", "-")
    for flag, suffix in (
        ("use_compile", "compile"),
        ("attention_mode", None),
        ("enable_xformers_memory_efficient_attention", "xformers"),
        ("gradient_checkpointing", "gc"),
        ("mixed_precision", "amp"),
    ):
        v = getattr(config, flag, None)
        if v:
            name += f"-{suffix or v}"
    path = os.path.join(results_dir, f"{index:03d}-{name}")
    os.makedirs(path, exist_ok=True)
    return path


# ---------------------------------------------------------------------------
# Video / image IO (OpenCV-based)
# ---------------------------------------------------------------------------

def save_video(path: str, video: np.ndarray, fps: int = 8) -> None:
    """Write (F, H, W, 3) uint8 RGB frames to mp4."""
    import cv2

    assert video.ndim == 4 and video.shape[-1] == 3, video.shape
    h, w = video.shape[1:3]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    try:
        for frame in video:
            writer.write(np.ascontiguousarray(frame[:, :, ::-1]))  # RGB->BGR
    finally:
        writer.release()


def read_video(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    """Read an mp4 into (F, H, W, 3) uint8 RGB."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok or (max_frames is not None and len(frames) >= max_frames):
                break
            frames.append(frame[:, :, ::-1])
    finally:
        cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def to_uint8(video: np.ndarray) -> np.ndarray:
    """[-1, 1] float video -> uint8."""
    return (np.clip((video + 1.0) / 2.0, 0, 1) * 255).astype(np.uint8)


def save_video_grid(path: str, videos: np.ndarray, fps: int = 8, ncols: Optional[int] = None) -> None:
    """(B, F, H, W, 3) uint8 -> single grid mp4 (reference `utils.py:255-272`)."""
    b, f, h, w, c = videos.shape
    ncols = ncols or int(math.ceil(math.sqrt(b)))
    nrows = int(math.ceil(b / ncols))
    pad = nrows * ncols - b
    if pad:
        videos = np.concatenate(
            [videos, np.zeros((pad, f, h, w, c), videos.dtype)], axis=0
        )
    grid = videos.reshape(nrows, ncols, f, h, w, c)
    grid = grid.transpose(2, 0, 3, 1, 4, 5).reshape(f, nrows * h, ncols * w, c)
    save_video(path, grid, fps=fps)


def save_image(path: str, image: np.ndarray) -> None:
    """(H, W, 3) uint8 RGB -> png."""
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, np.ascontiguousarray(image[:, :, ::-1]))


# ---------------------------------------------------------------------------
# Caption cleaning (PixArt-style, behavioral parity with utils.py:314-451)
# ---------------------------------------------------------------------------

_bad_punct_regex = re.compile(
    r"[" + "#®•©™&@·º½¾¿¡§~" + r"\)" + r"\(" + r"\]" + r"\[" + r"\}" + r"\{" + r"\|" + "\\" + r"\/" + r"\*" + r"]{1,}"
)


def clean_caption(caption: str) -> str:
    caption = str(caption).lower().strip()
    caption = ul.unquote_plus(caption)
    caption = caption.replace("<person>", "person")
    # urls
    caption = re.sub(r"\b((?:https?:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.](?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))", "", caption)
    caption = re.sub(r"\b((?:www:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.](?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))", "", caption)
    # html
    caption = html.unescape(html.unescape(caption))
    caption = re.sub(r"@[\w\d]+\b", "", caption)
    # unicode letter blocks
    for pat in (
        r"[\u31c0-\u31ef]+", r"[\u31f0-\u31ff]+", r"[\u3200-\u32ff]+",
        r"[\u3300-\u33ff]+", r"[\u3400-\u4dbf]+", r"[\u4dc0-\u4dff]+",
        r"[\u4e00-\u9fff]+",
    ):
        caption = re.sub(pat, "", caption)
    caption = re.sub(
        r"[\u002D\u058A\u05BE\u1400\u1806\u2010-\u2015\u2E17\u2E1A\u2E3A\u2E3B\u2E40\u301C\u3030\u30A0\uFE31\uFE32\uFE58\uFE63\uFF0D]+",
        "-",
        caption,
    )
    caption = re.sub(r"[`´«»“”¨]", '"', caption)
    caption = re.sub(r"[‘’]", "'", caption)
    caption = re.sub(r"&quot;?", "", caption)
    caption = re.sub(r"&amp", "", caption)
    caption = re.sub(r"\d:\d\d\s+$", "", caption)
    caption = re.sub(r"\\n", " ", caption)
    caption = re.sub(r"#\d{1,3}\b", "", caption)
    caption = re.sub(r"#\d{5,}\b", "", caption)
    caption = re.sub(r"\b\d{6,}\b", "", caption)
    caption = re.sub(r"[\S]+\.(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)", "", caption)
    caption = re.sub(r"[\"\']{2,}", r'"', caption)
    caption = re.sub(r"[\.]{2,}", r" ", caption)
    caption = re.sub(_bad_punct_regex, r" ", caption)
    caption = re.sub(r"\s+\.\s+", r" ", caption)
    caption = re.sub(r"(?:\-|\–)", " ", caption)
    caption = re.sub(r"\s+", " ", caption)
    caption = caption.strip()
    caption = re.sub(r"^[\"\']([\w\W]+)[\"\']$", r"\1", caption)
    caption = re.sub(r"^[\'\_,\-\:;]", r"", caption)
    caption = re.sub(r"[\'\_,\-\:\-\+]$", r"", caption)
    caption = re.sub(r"^\.\S+$", "", caption)
    return caption.strip()


def text_preprocessing(text, clean: bool = True) -> str:
    if clean:
        return clean_caption(text)
    return str(text).lower().strip()


# ---------------------------------------------------------------------------
# Reflection helpers (dnnlib parity: `tools/dnnlib/util.py:290-293`)
# ---------------------------------------------------------------------------

def get_obj_by_name(name: str):
    """Resolve a dotted path like ``latte_tpu.models.Latte`` to the object."""
    import importlib

    parts = name.split(".")
    for split in range(len(parts) - 1, 0, -1):
        try:
            module = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        obj = module
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
            return obj
        except AttributeError:
            continue
    raise ImportError(f"cannot resolve {name!r}")


def construct_class_by_name(class_name: str, *args, **kwargs):
    """Instantiate a class from its dotted name (config-driven construction)."""
    return get_obj_by_name(class_name)(*args, **kwargs)
