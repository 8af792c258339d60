"""Fused conv + FIR resampling.

Capability parity with `/root/reference/tools/torch_utils/ops/conv2d_resample.py`:
2D convolution composed with upfirdn-style up/downsampling (used by the
StyleGAN-V metric layers). Composition of :mod:`latte_tpu.kernels.upfirdn`
and :mod:`latte_tpu.kernels.gradfix` — XLA fuses the chain.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from latte_tpu.kernels.gradfix import conv2d
from latte_tpu.kernels.upfirdn import downsample2d, upsample2d


def conv2d_resample(
    x: jnp.ndarray,
    w: jnp.ndarray,
    f: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """(N, C, H, W) conv with optional FIR up/downsampling.

    up: FIR-upsample by ``up`` before the conv; down: FIR-downsample after.
    ``flip_weight=False`` gives true convolution (weights flipped).
    """
    if not flip_weight:
        w = jnp.flip(w, (2, 3))
    if up > 1:
        x = upsample2d(x, f if f is not None else jnp.ones((1,)), up=up)
    x = conv2d(x, w, padding=padding, groups=groups)
    if down > 1:
        x = downsample2d(x, f if f is not None else jnp.ones((1,)), down=down)
    return x
