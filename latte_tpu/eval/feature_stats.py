"""Streaming feature statistics for evaluation metrics.

Capability parity with `/root/reference/tools/metrics/metric_utils.py:64-140`
(`FeatureStats`): fp64 running mean/covariance and optional raw-feature
capture with a max-items cap, plus save/load and an md5-keyed cache like
the reference's (`metric_utils.py:203-220`). Multi-process gather goes
through `jax.experimental.multihost_utils.process_allgather` instead of
NCCL broadcast interleaving.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional

import numpy as np


class FeatureStats:
    def __init__(
        self,
        capture_all: bool = False,
        capture_mean_cov: bool = False,
        max_items: Optional[int] = None,
    ):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features: Optional[int] = None
        self.all_features: Optional[list] = None
        self.raw_mean: Optional[np.ndarray] = None
        self.raw_cov: Optional[np.ndarray] = None

    def set_num_features(self, num_features: int) -> None:
        if self.num_features is not None:
            assert num_features == self.num_features
            return
        self.num_features = num_features
        self.all_features = []
        self.raw_mean = np.zeros(num_features, dtype=np.float64)
        self.raw_cov = np.zeros((num_features, num_features), dtype=np.float64)

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[: self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def append_sharded(self, x: np.ndarray) -> None:
        """Append features computed on this process, gathering across all
        processes (interleaved like the reference's all-broadcast,
        `metric_utils.py:104-114`) so every process holds identical stats."""
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            x = np.concatenate(multihost_utils.process_allgather(x), axis=0)
        self.append(x)

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    # -- persistence & caching ------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(self.__dict__, f)
        os.replace(tmp, path)  # atomic, like the reference cache

    @classmethod
    def load(cls, path: str) -> "FeatureStats":
        with open(path, "rb") as f:
            state = pickle.load(f)
        obj = cls()
        obj.__dict__.update(state)
        return obj


def cache_path(cache_dir: str, *key_parts) -> str:
    """md5-keyed stats cache file (reference `metric_utils.py:203-211`)."""
    tag = hashlib.md5(repr(sorted(map(repr, key_parts))).encode()).hexdigest()
    return os.path.join(cache_dir, f"stats-{tag}.pkl")
