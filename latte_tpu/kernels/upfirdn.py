"""upfirdn2d (upsample → FIR filter → downsample) — XLA implementation.

Capability parity with the reference plugin wrapper
(`/root/reference/tools/torch_utils/ops/upfirdn2d.py`): `upfirdn2d` plus
the `setup_filter` / `filter2d` / `upsample2d` / `downsample2d` helpers.
On TPU the whole pipeline is one `lax.conv_general_dilated`: zero-stuffed
upsampling is LHS dilation, downsampling is output striding, so XLA lowers
it straight onto the conv/MXU units — no custom kernel needed.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntPair = Union[int, Tuple[int, int], Sequence[int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return int(v[0]), int(v[1])
    return int(v), int(v)


def _padding4(v) -> Tuple[int, int, int, int]:
    if isinstance(v, int):
        return v, v, v, v
    v = tuple(int(x) for x in v)
    if len(v) == 2:
        # reference convention (`upfirdn2d._parse_padding`): [padx, pady]
        # -> (padx0, padx1, pady0, pady1) = (padx, padx, pady, pady)
        return v[0], v[0], v[1], v[1]
    assert len(v) == 4
    return v


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable=None,
) -> jnp.ndarray:
    """Prepare a FIR filter: 1D taps become an outer-product 2D kernel
    (reference `upfirdn2d.py:72-116` semantics, always materialized 2D)."""
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 0:
        f = f[None]
    if f.ndim == 1:
        f = jnp.outer(f, f)
    assert f.ndim == 2
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = f[::-1, ::-1]
    return f * (gain ** (f.ndim / 2))


def upfirdn2d(
    x: jnp.ndarray,
    f: jnp.ndarray,
    up: IntPair = 1,
    down: IntPair = 1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jnp.ndarray:
    """(N, C, H, W) -> zero-stuff up, pad, filter, stride down."""
    upx, upy = _pair(up)
    downx, downy = _pair(down)
    padx0, padx1, pady0, pady1 = _padding4(padding)
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    if not flip_filter:  # correlation == conv with flipped kernel
        f = f[::-1, ::-1]

    N, C, H, W = x.shape
    fh, fw = f.shape
    kernel = jnp.tile(f[None, None], (C, 1, 1, 1)).astype(x.dtype)  # (C,1,fh,fw)

    # lhs_dilation inserts zeros BETWEEN samples, producing (H-1)*up+1
    # rows; classic upfirdn zero-stuffs to H*up, i.e. (up-1) trailing
    # zeros — emulate them as extra end-padding.
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )
    return out * gain


def filter2d(x, f, padding=0, flip_filter=False, gain: float = 1.0):
    """Filter without resampling; default padding keeps the resolution."""
    f = jnp.asarray(f, jnp.float32)
    fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    padx0, padx1, pady0, pady1 = _padding4(padding)
    return upfirdn2d(
        x,
        f,
        padding=(
            padx0 + fw // 2,
            padx1 + (fw - 1) // 2,
            pady0 + fh // 2,
            pady1 + (fh - 1) // 2,
        ),
        flip_filter=flip_filter,
        gain=gain,
    )


def upsample2d(x, f, up: IntPair = 2, padding=0, flip_filter=False, gain: float = 1.0):
    upx, upy = _pair(up)
    f = jnp.asarray(f, jnp.float32)
    fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    padx0, padx1, pady0, pady1 = _padding4(padding)
    return upfirdn2d(
        x,
        f,
        up=up,
        padding=(
            padx0 + (fw + upx - 1) // 2,
            padx1 + (fw - upx) // 2,
            pady0 + (fh + upy - 1) // 2,
            pady1 + (fh - upy) // 2,
        ),
        flip_filter=flip_filter,
        gain=gain * upx * upy,
    )


def downsample2d(x, f, down: IntPair = 2, padding=0, flip_filter=False, gain: float = 1.0):
    downx, downy = _pair(down)
    f = jnp.asarray(f, jnp.float32)
    fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    padx0, padx1, pady0, pady1 = _padding4(padding)
    return upfirdn2d(
        x,
        f,
        down=down,
        padding=(
            padx0 + (fw - downx + 1) // 2,
            padx1 + (fw - downx) // 2,
            pady0 + (fh - downy + 1) // 2,
            pady1 + (fh - downy) // 2,
        ),
        flip_filter=flip_filter,
        gain=gain,
    )
