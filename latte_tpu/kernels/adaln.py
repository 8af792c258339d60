"""Fused adaLN-Zero glue kernels (Pallas, TPU).

The DiT block's elementwise glue — LayerNorm (no scale/bias), adaLN
modulate ``x*(1+scale)+shift``, and the gated residual add — is the
largest non-matmul category in the XL/2 sampling step trace
(8.6 ms/step of a ~30 ms step; docs/tpu_notes.md "MFU roofline").
XLA emits it as several fusions, each re-reading the (rows, D)
activation from HBM. These kernels collapse the chain into single
HBM passes:

- :func:`ln_modulate`              out  = LN(x) * (1+scale) + shift
- :func:`residual_ln_modulate`     y    = x + gate * delta
                                   out  = LN(y) * (1+scale) + shift
                                   (returns both: ``y`` is the residual
                                   carry, ``out`` feeds the next matmul)

Stats are computed in fp32 regardless of the activation dtype (same
numerics as ``nn.LayerNorm(dtype=...)`` which upcasts for the
reduction); eps = 1e-6 matches the reference DiT blocks
(`/root/reference/models/latte.py:160-181`). Variance is two-pass
``E[(x-mu)^2]`` — matching torch ``nn.LayerNorm`` and the unfused
blocks' ``use_fast_variance=False`` norms, NOT flax's fast-variance
default ``E[x^2]-E[x]^2`` (which diverges by ~3e-3 at mean-offset-100
inputs; the two-pass side is the more accurate one).

Both ops carry a ``jax.custom_vjp`` whose backward is the standard
LayerNorm gradient algebra composed with the modulate/residual terms,
so they are usable in the training step, not just serving.

Shapes: x/delta (B, N, D); gate/shift/scale (B, D) broadcast over N.
D must be a multiple of 128 (lane tiling); the DiT widths (384/768/
1024/1152) all qualify. Grid is over B with one batch element per
program — N×D blocks (256×1152 spatial, 16×1152 temporal) are far
under VMEM, and the B-grid double-buffers the HBM streams.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-6


def _ln_mod_kernel(x_ref, shift_ref, scale_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)       # (bs, N, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    norm = (x - mu) * jax.lax.rsqrt(var + _EPS)
    sc = scale_ref[...].astype(jnp.float32)  # (bs, 1, D)
    sh = shift_ref[...].astype(jnp.float32)
    out_ref[...] = (norm * (1.0 + sc) + sh).astype(out_ref.dtype)


def _res_ln_mod_kernel(x_ref, delta_ref, gate_ref, shift_ref, scale_ref, y_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)       # (bs, N, D)
    d = delta_ref[...].astype(jnp.float32)
    g = gate_ref[...].astype(jnp.float32)    # (bs, 1, D)
    # round the carry to the storage dtype BEFORE the LN stats — exactly
    # what the unfused block does (residual add in model dtype, LN upcasts
    # the stored activation). Variance is two-pass E[(x-mu)^2] — the same
    # formula as the unfused norm1/norm2 (use_fast_variance=False) and
    # torch nn.LayerNorm; flax's fast-variance E[x^2]-E[x]^2 default would
    # diverge by up to ~3e-3 at large mean offsets.
    y_st = (x + g * d).astype(y_ref.dtype)
    y_ref[...] = y_st
    y = y_st.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    norm = (y - mu) * jax.lax.rsqrt(var + _EPS)
    sc = scale_ref[...].astype(jnp.float32)
    sh = shift_ref[...].astype(jnp.float32)
    out_ref[...] = (norm * (1.0 + sc) + sh).astype(out_ref.dtype)


def _pick_bs(B, N, D, itemsize) -> int:
    """Rows-per-program: aim for ~1 MB activation blocks (amortizes the
    per-program overhead on short-token layouts like temporal N=16) while
    dividing B exactly. Spatial (32, 256, 1152)bf16 -> bs 2; temporal
    (512, 16, 1152)bf16 -> bs 16."""
    target = max(1, (1 << 20) // max(1, N * D * itemsize))
    best = 1
    for bs in range(1, B + 1):
        if B % bs == 0 and bs <= target:
            best = bs
    return best


def _row_spec(bs, N, D):
    return pl.BlockSpec((bs, N, D), lambda b: (b, 0, 0))


def _vec_spec(bs, D):
    # (B, D) conditioning vectors are fed as (B, 1, D) so the per-program
    # block (bs, 1, D) matches the array's trailing dims (Mosaic tiling rule)
    return pl.BlockSpec((bs, 1, D), lambda b: (b, 0, 0))


def _ln_modulate_fwd_impl(x, shift, scale):
    B, N, D = x.shape
    shift = shift.reshape(B, 1, D)
    scale = scale.reshape(B, 1, D)
    bs = _pick_bs(B, N, D, x.dtype.itemsize)

    def call(interpret):
        def f(x, shift, scale):
            return pl.pallas_call(
                _ln_mod_kernel,
                grid=(B // bs,),
                in_specs=[_row_spec(bs, N, D), _vec_spec(bs, D), _vec_spec(bs, D)],
                out_specs=_row_spec(bs, N, D),
                out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
                interpret=interpret,
            )(x, shift, scale)

        return f

    # Branch on the LOWERING platform (not the trace-time default backend):
    # a cross-platform AOT export traced on a CPU host but targeting TPU
    # must bake the native Mosaic kernel, not interpret-mode HLO.
    return jax.lax.platform_dependent(
        x, shift, scale, tpu=call(False), default=call(True)
    )


def _res_ln_modulate_fwd_impl(x, delta, gate, shift, scale):
    B, N, D = x.shape
    gate = gate.reshape(B, 1, D)
    shift = shift.reshape(B, 1, D)
    scale = scale.reshape(B, 1, D)
    bs = _pick_bs(B, N, D, x.dtype.itemsize)

    def call(interpret):
        def f(x, delta, gate, shift, scale):
            return pl.pallas_call(
                _res_ln_mod_kernel,
                grid=(B // bs,),
                in_specs=[_row_spec(bs, N, D)] * 2 + [_vec_spec(bs, D)] * 3,
                out_specs=[_row_spec(bs, N, D)] * 2,
                out_shape=[
                    jax.ShapeDtypeStruct((B, N, D), x.dtype),
                    jax.ShapeDtypeStruct((B, N, D), x.dtype),
                ],
                interpret=interpret,
            )(x, delta, gate, shift, scale)

        return f

    return jax.lax.platform_dependent(
        x, delta, gate, shift, scale, tpu=call(False), default=call(True)
    )


def _ln_stats(y32):
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return (y32 - mu) * rstd, rstd


def _ln_mod_bwd_math(y, shift, scale, g_out):
    """VJP of out = LN(y)*(1+scale)+shift wrt (y, shift, scale).

    Standard LayerNorm backward: with n = LN(y), dL/dn = g*(1+scale),
    dL/dy = rstd * (dn - mean(dn) - n * mean(dn * n)).
    """
    y32 = y.astype(jnp.float32)
    g32 = g_out.astype(jnp.float32)
    norm, rstd = _ln_stats(y32)
    dshift = jnp.sum(g32, axis=1)
    dscale = jnp.sum(g32 * norm, axis=1)
    dn = g32 * (1.0 + scale.astype(jnp.float32)[:, None, :])
    dn_mean = jnp.mean(dn, axis=-1, keepdims=True)
    dnn_mean = jnp.mean(dn * norm, axis=-1, keepdims=True)
    dy = rstd * (dn - dn_mean - norm * dnn_mean)
    return dy, dshift, dscale


@jax.custom_vjp
def ln_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """``LN(x) * (1 + scale) + shift`` in one HBM pass (no LN scale/bias)."""
    return _ln_modulate_fwd_impl(x, shift, scale)


def _ln_modulate_fwd(x, shift, scale):
    return _ln_modulate_fwd_impl(x, shift, scale), (x, shift, scale)


def _ln_modulate_bwd(res, g_out):
    x, shift, scale = res
    dy, dshift, dscale = _ln_mod_bwd_math(x, shift, scale, g_out)
    return (
        dy.astype(x.dtype),
        dshift.astype(shift.dtype),
        dscale.astype(scale.dtype),
    )


ln_modulate.defvjp(_ln_modulate_fwd, _ln_modulate_bwd)


@jax.custom_vjp
def residual_ln_modulate(
    x: jnp.ndarray,
    delta: jnp.ndarray,
    gate: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gated residual + LN + modulate fused: returns ``(y, out)`` with
    ``y = x + gate*delta`` (the residual carry) and
    ``out = LN(y)*(1+scale)+shift`` (the next matmul's input)."""
    return _res_ln_modulate_fwd_impl(x, delta, gate, shift, scale)


def _res_ln_modulate_fwd(x, delta, gate, shift, scale):
    y, out = _res_ln_modulate_fwd_impl(x, delta, gate, shift, scale)
    return (y, out), (y, delta, gate, shift, scale)


def _res_ln_modulate_bwd(res, cotangents):
    y, delta, gate, shift, scale = res
    g_y, g_out = cotangents
    dy_ln, dshift, dscale = _ln_mod_bwd_math(y, shift, scale, g_out)
    dy = dy_ln + g_y.astype(jnp.float32)
    g32 = gate.astype(jnp.float32)[:, None, :]
    d32 = delta.astype(jnp.float32)
    dx = dy
    ddelta = dy * g32
    dgate = jnp.sum(dy * d32, axis=1)
    return (
        dx.astype(y.dtype),
        ddelta.astype(delta.dtype),
        dgate.astype(gate.dtype),
        dshift.astype(shift.dtype),
        dscale.astype(scale.dtype),
    )


residual_ln_modulate.defvjp(_res_ln_modulate_fwd, _res_ln_modulate_bwd)


def ln_modulate_reference(x, shift, scale):
    """Pure-jnp oracle (same math XLA compiles in the unfused block)."""
    x32 = x.astype(jnp.float32)
    norm, _ = _ln_stats(x32)
    out = norm * (1.0 + scale.astype(jnp.float32)[:, None, :]) + shift.astype(
        jnp.float32
    )[:, None, :]
    return out.astype(x.dtype)


def residual_ln_modulate_reference(x, delta, gate, shift, scale):
    y32 = x.astype(jnp.float32) + gate.astype(jnp.float32)[:, None, :] * delta.astype(
        jnp.float32
    )
    y = y32.astype(x.dtype)
    return y, ln_modulate_reference(y, shift, scale)
