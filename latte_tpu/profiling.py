"""Profiling and cost analysis.

Fills the reference's tracing slots (SURVEY.md §5.1): `profiled_function`
(`tools/torch_utils/misc.py:99-107`), thop FLOPs counting
(`models/latte.py:518-520`), and synchronize-based throughput timing
(`train.py:242-251`) — TPU-native via `jax.profiler` and XLA's own cost
analysis (no third-party FLOPs counter needed).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profiled_function(fn: Callable) -> Callable:
    """Annotate a function so it shows up as a named region in traces."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


def cost_analysis(fn: Callable, *example_args, **example_kwargs) -> Dict[str, float]:
    """XLA cost analysis of a jitted function: flops, bytes accessed.

    The TPU-native replacement for the reference's thop profiling — the
    numbers come from the compiler itself.
    """
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    return {
        "flops": float(analysis.get("flops", -1.0)),
        "bytes_accessed": float(analysis.get("bytes accessed", -1.0)),
    }


class Timer:
    """Wall-clock timer that defeats async dispatch by materializing a
    scalar from the result (plain `block_until_ready` can be unreliable on
    remote-attached backends)."""

    def __init__(self):
        self.start = time.perf_counter()

    def elapsed(self, result: Optional[Any] = None) -> float:
        if result is not None:
            leaf = jax.tree_util.tree_leaves(result)[0]
            np.asarray(leaf).ravel()[:1]  # force
        return time.perf_counter() - self.start


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median seconds per call, chained where possible."""
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    return (time.perf_counter() - t0) / iters
