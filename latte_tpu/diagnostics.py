"""Consistency checks and model introspection.

Capability parity with `/root/reference/tools/torch_utils/misc.py`:
`assert_shape` (`:80-97`), `check_ddp_consistency` (`:179-191`),
`print_module_summary` (`:193+`), `InfiniteSampler` (`:110-144`) — plus a
fault-detection-oriented NaN/Inf scan the reference lacks.
"""

from __future__ import annotations

import random
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert shape; None entries are wildcards."""
    assert x.ndim == len(ref_shape), f"rank {x.ndim} != {len(ref_shape)}"
    for i, (got, want) in enumerate(zip(x.shape, ref_shape)):
        if want is not None and got != want:
            raise AssertionError(f"dim {i}: {got} != {want} (shape {x.shape})")


def check_params_consistency(params, mesh=None) -> bool:
    """Verify replicated params are bit-identical across devices/processes.

    The TPU analog of the reference's `check_ddp_consistency`: fully
    addressable shards of each replicated leaf must carry equal checksums.
    """
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        arr = leaf
        if not hasattr(arr, "addressable_shards"):
            continue
        sums = {
            float(np.asarray(s.data, dtype=np.float64).sum())
            for s in arr.addressable_shards
        }
        if len(sums) > 1:
            raise AssertionError(
                f"param {jax.tree_util.keystr(path)} diverges across devices: {sums}"
            )
    return True


def find_nonfinite(tree) -> List[str]:
    """Names of leaves containing NaN/Inf (simple failure detection)."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad.append(jax.tree_util.keystr(path))
    return bad


def print_module_summary(module, *example_args, **example_kwargs) -> str:
    """Per-module parameter/shape table (flax tabulate)."""
    summary = module.tabulate(
        jax.random.PRNGKey(0),
        *example_args,
        depth=2,
        console_kwargs={"width": 120},
        **example_kwargs,
    )
    print(summary)
    return summary


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


class InfiniteSampler:
    """Infinite shard-aware shuffled index stream (same capability slot as
    the reference's `misc.py` InfiniteSampler, re-designed: deterministic
    full reshuffle per epoch keyed on (seed, epoch), rather than the
    original's incremental sliding-window swaps — simpler, and epochs are
    reproducible independently of how far the stream was consumed)."""

    def __init__(
        self,
        dataset_size: int,
        rank: int = 0,
        num_replicas: int = 1,
        shuffle: bool = True,
        seed: int = 0,
    ):
        assert dataset_size > 0
        assert 0 <= rank < num_replicas
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed

    def epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(self.dataset_size)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        return order

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            order = self.epoch_order(epoch)
            # interleaved striding: replicas partition each epoch's order
            for v in order[self.rank :: self.num_replicas]:
                yield int(v)
            epoch += 1
