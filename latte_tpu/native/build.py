"""Hash-cached native (C++) op builder.

Fills the role of the reference's JIT CUDA plugin loader
(`/root/reference/tools/torch_utils/custom_ops.py:46-124`): sources are
md5-digested into a per-version build directory, compiled once with g++,
and concurrent processes serialize on a lock file (the reference's
FileBaton idea). Python binds via ctypes — no pybind11 on this image.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import time
from typing import Optional, Sequence

_CACHE_ROOT = os.environ.get(
    "LATTE_TPU_NATIVE_CACHE", os.path.expanduser("~/.cache/latte_tpu_native")
)
_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")


class _FileLock:
    """Cross-process build lock (spin on an O_EXCL lock file)."""

    def __init__(self, path: str, timeout: float = 120.0):
        self.path = path
        self.timeout = timeout
        self.fd: Optional[int] = None

    def __enter__(self):
        deadline = time.time() + self.timeout
        while True:
            try:
                self.fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                if time.time() > deadline:
                    # stale lock: steal it
                    try:
                        os.unlink(self.path)
                    except FileNotFoundError:
                        pass
                time.sleep(0.05)

    def __exit__(self, *exc):
        if self.fd is not None:
            os.close(self.fd)
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass


def _digest(paths: Sequence[str], extra: str = "") -> str:
    h = hashlib.md5()
    for p in sorted(paths):
        with open(p, "rb") as f:
            h.update(f.read())
    h.update(extra.encode())
    return h.hexdigest()[:16]


def build_library(
    name: str,
    sources: Sequence[str],
    extra_cflags: Sequence[str] = (),
) -> Optional[ctypes.CDLL]:
    """Compile `sources` (paths relative to native/src) into a cached .so.

    Returns None if no compiler is available — callers fall back to the
    pure-Python implementation (mirroring the reference's graceful CUDA
    fallback, `bias_act.py:47-51`).
    """
    sources = [
        s if os.path.isabs(s) else os.path.join(_SRC_DIR, s) for s in sources
    ]
    try:
        tag = _digest(sources, " ".join(extra_cflags))
    except FileNotFoundError:
        return None
    build_dir = os.path.join(_CACHE_ROOT, f"{name}-{tag}")
    so_path = os.path.join(build_dir, f"lib{name}.so")
    if not os.path.exists(so_path):
        os.makedirs(build_dir, exist_ok=True)
        with _FileLock(os.path.join(build_dir, ".lock")):
            if not os.path.exists(so_path):
                cmd = [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-fopenmp", "-march=native",
                    *extra_cflags, *sources, "-o", so_path + ".tmp",
                ]
                try:
                    subprocess.run(
                        cmd, check=True, capture_output=True, text=True
                    )
                except (subprocess.CalledProcessError, FileNotFoundError):
                    return None
                os.replace(so_path + ".tmp", so_path)
    try:
        return ctypes.CDLL(so_path)
    except OSError:
        return None
