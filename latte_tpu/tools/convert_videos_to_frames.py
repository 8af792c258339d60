"""mp4 -> frame-folder converter for metric preparation.

Capability parity with `/root/reference/tools/convert_videos_to_frames.py`
(multiprocessing Pool over videos; moviepy there, OpenCV here).

Usage: ``python -m latte_tpu.tools.convert_videos_to_frames -s VIDEOS_DIR
-t FRAMES_DIR [--target_size 256] [--workers 8]``
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
from functools import partial
from typing import Optional, Tuple


def convert_one(video_path: str, source_dir: str, target_dir: str,
                target_size: Optional[int] = None) -> int:
    import cv2
    import numpy as np

    rel = os.path.relpath(video_path, source_dir)
    out_dir = os.path.join(target_dir, os.path.splitext(rel)[0])
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if target_size:
                h, w = frame.shape[:2]
                s = min(h, w)
                y0, x0 = (h - s) // 2, (w - s) // 2
                frame = cv2.resize(
                    frame[y0 : y0 + s, x0 : x0 + s],
                    (target_size, target_size),
                    interpolation=cv2.INTER_AREA,
                )
            cv2.imwrite(os.path.join(out_dir, f"{i:06d}.jpg"), frame)
            i += 1
    finally:
        cap.release()
    return i


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--source_dir", required=True)
    p.add_argument("-t", "--target_dir", required=True)
    p.add_argument("--target_size", type=int, default=None)
    p.add_argument("--workers", type=int, default=8)
    a = p.parse_args()

    videos = []
    for dirpath, _, files in os.walk(a.source_dir):
        videos += [
            os.path.join(dirpath, f)
            for f in files
            if f.lower().endswith((".mp4", ".avi", ".mov"))
        ]
    videos.sort()
    fn = partial(
        convert_one,
        source_dir=a.source_dir,
        target_dir=a.target_dir,
        target_size=a.target_size,
    )
    with mp.Pool(a.workers) as pool:
        counts = pool.map(fn, videos)
    print(f"converted {len(videos)} videos, {sum(counts)} frames")


if __name__ == "__main__":
    main()
