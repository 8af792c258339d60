"""API shims for the reference's autograd-fix ops.

The reference carries custom `autograd.Function`s to get second-order
gradients and `no_weight_gradients` for conv2d/grid_sample, plus a fused
multiply-add with unbroadcast (`/root/reference/tools/torch_utils/ops/
{conv2d_gradfix,grid_sample_gradfix,fma}.py`, SURVEY.md §2.7). JAX's
autodiff is composable to arbitrary order, so these are thin functional
equivalents — documented entry points, not workarounds.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_weight_gradients_disabled = False


@contextlib.contextmanager
def no_weight_gradients(disable: bool = True):
    """Inside this context, conv2d() stops gradients w.r.t. its weights
    (regularizer passes in the reference use this)."""
    global _weight_gradients_disabled
    old = _weight_gradients_disabled
    if disable:
        _weight_gradients_disabled = True
    try:
        yield
    finally:
        _weight_gradients_disabled = old


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    transpose: bool = False,
    output_padding: int = 0,
) -> jnp.ndarray:
    """NCHW conv (or transposed conv) with optional frozen-weight grads."""
    if _weight_gradients_disabled:
        w = jax.lax.stop_gradient(w)
    if not transpose:
        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
        )
    # transposed conv: lhs dilation by stride; weight layout IOHW -> flip
    kh, kw = w.shape[2], w.shape[3]
    pad_h = dilation * (kh - 1) - padding
    pad_w = dilation * (kw - 1) - padding
    return jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, (2, 3)).swapaxes(0, 1),
        window_strides=(1, 1),
        padding=(
            (pad_h, pad_h + output_padding),
            (pad_w, pad_w + output_padding),
        ),
        lhs_dilation=(stride, stride),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid sample, NCHW + (N, Hg, Wg, 2) grids in [-1, 1]
    (align_corners=False semantics); fully differentiable to any order."""
    N, C, H, W = x.shape
    gx = (grid[..., 0] + 1.0) * (W / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (H / 2.0) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        ix = jnp.clip(ix.astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(iy.astype(jnp.int32), 0, H - 1)
        # (N, Hg, Wg) indices into (N, C, H, W)
        return jax.vmap(lambda img, jx, jy: img[:, jy, jx])(x, ix, iy)

    def inside(ix, iy):
        return (
            (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ).astype(x.dtype)[:, None]

    out = (
        gather(x0, y0) * (inside(x0, y0) * ((1 - wx) * (1 - wy))[:, None])
        + gather(x0 + 1, y0) * (inside(x0 + 1, y0) * (wx * (1 - wy))[:, None])
        + gather(x0, y0 + 1) * (inside(x0, y0 + 1) * ((1 - wx) * wy)[:, None])
        + gather(x0 + 1, y0 + 1) * (inside(x0 + 1, y0 + 1) * (wx * wy)[:, None])
    )
    return out


def fma(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """a * b + c — XLA fuses this on its own; kept for API parity."""
    return a * b + c
