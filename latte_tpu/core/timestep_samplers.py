"""Timestep samplers for training (uniform + importance sampling).

Capability parity with `/root/reference/diffusion/timestep_sampler.py:13-150`.
The loss-aware resampler keeps its loss history host-side in numpy: the
per-step (t, loss) pairs are tiny, and in multi-host JAX they are already
globally averaged/gathered by the jitted train step before reaching the
host, replacing the reference's explicit `dist.all_gather`.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gather_to_host(x) -> np.ndarray:
    """Materialize a (possibly multi-host-sharded) global array on every
    process. Single-process arrays are fully addressable and transfer
    directly; multi-process goes through ``process_allgather``."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def create_named_schedule_sampler(name: str, diffusion) -> "ScheduleSampler":
    if name == "uniform":
        return UniformSampler(diffusion)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(diffusion)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler(ABC):
    """Distribution over timesteps, with importance-sampling weights."""

    @abstractmethod
    def weights(self) -> np.ndarray:
        """Unnormalized weights, one per diffusion timestep."""

    def sample(self, rng: jax.Array, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Importance-sample timesteps: returns (t [B] int32, weights [B])."""
        w = np.asarray(self.weights(), dtype=np.float64)
        p = w / w.sum()
        t = jax.random.choice(
            rng, w.shape[0], shape=(batch_size,), p=jnp.asarray(p, jnp.float32)
        ).astype(jnp.int32)
        inv_p = jnp.asarray(1.0 / (p * len(p)), dtype=jnp.float32)
        return t, jnp.take(inv_p, t)


class UniformSampler(ScheduleSampler):
    def __init__(self, diffusion):
        self.diffusion = diffusion
        self._weights = np.ones(diffusion.num_timesteps, dtype=np.float64)

    def weights(self) -> np.ndarray:
        return self._weights

    def sample(self, rng: jax.Array, batch_size: int):
        # Fast path: plain randint, weights all ones.
        t = jax.random.randint(
            rng, (batch_size,), 0, self.diffusion.num_timesteps, dtype=jnp.int32
        )
        return t, jnp.ones((batch_size,), dtype=jnp.float32)


class LossAwareSampler(ScheduleSampler):
    def update_with_local_losses(self, ts, losses) -> None:
        """Feed per-step (t, loss) pairs, syncing across processes.

        TPU equivalent of the reference's explicit NCCL all_gather of
        per-rank batch sizes and padded loss tensors
        (`/root/reference/diffusion/timestep_sampler.py:82-103`): ``ts`` /
        ``losses`` may be global jax arrays from the jitted train step
        (possibly non-addressable under multi-host dp sharding) — they are
        materialized identically on every process before the history
        update, so the resampling weights stay bit-identical across hosts
        (divergent weights would silently de-synchronize the sampled
        timesteps and with them every subsequent collective).
        """
        self.update_with_all_losses(
            _gather_to_host(ts), _gather_to_host(losses)
        )

    def update_with_all_losses(self, ts: np.ndarray, losses: np.ndarray) -> None:
        """Update the reweighting from globally-gathered (t, loss) pairs.

        Callers in multi-host settings must pass the *global* batch (e.g.
        gathered via `multihost_utils.process_allgather` or computed from a
        fully-replicated loss vector).
        """
        raise NotImplementedError


class LossSecondMomentResampler(LossAwareSampler):
    """Importance-sample t proportional to sqrt(E[loss^2]) with uniform floor."""

    def __init__(self, diffusion, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.diffusion = diffusion
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros(
            (diffusion.num_timesteps, history_per_term), dtype=np.float64
        )
        self._loss_counts = np.zeros(diffusion.num_timesteps, dtype=np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones(self.diffusion.num_timesteps, dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts).ravel(), np.asarray(losses).ravel()):
            t = int(t)
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())
