"""Positional / timestep / label embeddings for the DiT models.

Sin-cos tables are computed host-side in fp64 numpy (they are frozen,
non-trainable constants in the reference too — `models/latte.py:246-247,266-271`)
and baked into the jitted program as fp32 constants.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_1d_sincos_pos_embed",
    "get_2d_sincos_pos_embed",
    "timestep_embedding",
    "TimestepEmbedder",
    "LabelEmbedder",
]


def _sincos_from_positions(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, D) [sin | cos] embedding (fp64)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_1d_sincos_pos_embed(embed_dim: int, length: int) -> np.ndarray:
    """Temporal (frame-axis) positional table, shape (length, D)."""
    return _sincos_from_positions(embed_dim, np.arange(length))


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Spatial patch-grid positional table, shape (grid², D).

    Width occupies the first D/2 dims, height the second (reference layout,
    `models/latte.py:410-436`): position of patch (h, w) at flat index
    h*grid + w.
    """
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    # w varies fastest in the flattened grid
    ww, hh = np.meshgrid(grid_w, grid_h)
    # Reference quirk (`models/latte.py:416-433`): `meshgrid(grid_w, grid_h)`
    # puts the W positions in `grid[0]`, which feeds the variable the MAE
    # code *names* `emb_h` — so the first D/2 dims actually encode WIDTH.
    # Match it exactly (verified vs the executed reference in
    # tests/test_reference_model_parity.py).
    emb_first = _sincos_from_positions(embed_dim // 2, ww.reshape(-1))
    emb_second = _sincos_from_positions(embed_dim // 2, hh.reshape(-1))
    return np.concatenate([emb_first, emb_second], axis=1)


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep features: (N,) -> (N, dim), [cos | sin] order
    (GLIDE convention, reference `models/latte.py:97-116`)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """MLP over sinusoidal timestep features."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="mlp_0",
        )(x.astype(self.dtype))
        x = nn.silu(x)
        x = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="mlp_2",
        )(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout (extra null-class row)."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        labels: jnp.ndarray,
        train: bool = False,
        force_drop_ids: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        use_cfg_embedding = self.dropout_prob > 0
        table = self.param(
            "embedding_table",
            nn.initializers.normal(stddev=0.02),
            (self.num_classes + int(use_cfg_embedding), self.hidden_size),
        )
        if force_drop_ids is not None:
            labels = jnp.where(force_drop_ids == 1, self.num_classes, labels)
        elif train and use_cfg_embedding:
            rng = self.make_rng("label_dropout")
            drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            labels = jnp.where(drop, self.num_classes, labels)
        return jnp.take(table, labels, axis=0).astype(self.dtype)
