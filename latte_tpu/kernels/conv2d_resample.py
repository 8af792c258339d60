"""Fused conv + FIR resampling.

Capability parity with `/root/reference/tools/torch_utils/ops/conv2d_resample.py`:
2D convolution composed with upfirdn-style up/downsampling (used by the
StyleGAN-V metric layers). Implements the reference's generic composition
(`conv2d_resample.py:94-152`): user padding and the filter offsets fold
into the FIR stage BEFORE the valid convolution — padding at the conv
stage instead would zero the border pixels the reference fills with
FIR-filtered bleed. XLA fuses the chain.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from latte_tpu.kernels.gradfix import conv2d
from latte_tpu.kernels.upfirdn import _padding4, upfirdn2d


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
    kh, kw = int(w.shape[2]), int(w.shape[3])
    if f is not None:
        ff = jnp.asarray(f, jnp.float32)
        fh, fw = (ff.shape[0], ff.shape[0]) if ff.ndim == 1 else ff.shape
    else:
        fh = fw = 1
    px0, px1, py0, py1 = _padding4(padding)

    # fold the resampling filter offsets into the padding (reference
    # `conv2d_resample.py:95-104`)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    x = upfirdn2d(
        x,
        f if (up > 1 and f is not None) else jnp.ones((1, 1), jnp.float32),
        up=up,
        padding=(px0, px1, py0, py1),
        gain=up**2,
    )
    if not flip_weight:
        w = jnp.flip(w, (2, 3))
    x = conv2d(x, w, padding=0, groups=groups)
    if down > 1:
        x = upfirdn2d(
            x,
            f if f is not None else jnp.ones((1, 1), jnp.float32),
            down=down,
        )
    return x
