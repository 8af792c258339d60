"""Pallas flash attention for TPU.

Fills the reference's `attention_mode ∈ {math, flash, xformers}` kernel slot
(`/root/reference/models/latte.py:53-73`) with a TPU-native online-softmax
kernel: Q blocks stream through VMEM while K/V are consumed block-by-block,
so the N×N score matrix is never materialized in HBM.

Two token layouts matter for Latte (SURVEY.md §5.7): long spatial sequences
(HW/p² tokens, e.g. 1024 @ 256²) — where this kernel wins — and short
temporal sequences (F = 16) — where the fused XLA path is faster; the model
dispatches between them ("auto" mode).

The backward pass currently routes through the mathematically identical XLA
attention via `jax.custom_vjp` (correct gradients everywhere; a Pallas
backward kernel is a planned optimization for the training hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["flash_attention", "attention_reference"]

_NEG_INF = -1e30


def attention_reference(q, k, v):
    """Fused-XLA attention; fp32 softmax. Layout (B, N, H, D)."""
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm",
        (q * scale).astype(jnp.float32),
        k.astype(jnp.float32),
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """Online-softmax attention for R independent rows at once.

    Batching R (batch·head) rows per grid invocation amortizes the
    per-invocation overhead that dominates at Latte's shapes (head_dim 72,
    N 1024): 2048 tiny invocations -> BH/R larger ones.
    """
    q = q_ref[...].astype(jnp.float32) * scale  # (R, bq, D)
    seq_k = k_ref.shape[1]
    nk = seq_k // block_k
    R, bq, D = q.shape

    acc = jnp.zeros((R, bq, D), jnp.float32)
    m = jnp.full((R, bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((R, bq, 1), jnp.float32)

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[:, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[:, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, bq, bk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p,
            v_blk,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return acc, m_new, l

    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc, m, l))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _flash_forward(
    q, k, v, block_q: int, block_k: int, interpret: bool, rows: int = 4
):
    B, N, H, D = q.shape
    scale = D**-0.5
    # (B, N, H, D) -> (B*H, N, D): heads become independent rows.
    qr = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kr = k.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    vr = v.transpose(0, 2, 1, 3).reshape(B * H, N, D)

    BH = B * H
    while rows > 1 and BH % rows:
        rows //= 2
    grid = (BH // rows, N // block_q)
    kw = {} if _VMEM is None else {"memory_space": _VMEM}
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
            pl.BlockSpec((rows, N, D), lambda b, i: (b, 0, 0), **kw),
            pl.BlockSpec((rows, N, D), lambda b, i: (b, 0, 0), **kw),
        ],
        out_specs=pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, block_q, block_k, rows):
    interpret = jax.default_backend() != "tpu"
    return _flash_forward(q, k, v, block_q, block_k, interpret, rows=rows)


def _flash_fwd(q, k, v, block_q, block_k, rows):
    return _flash(q, k, v, block_q, block_k, rows), (q, k, v)


def _flash_bwd(block_q, block_k, rows, res, g):
    q, k, v = res
    if jax.default_backend() == "tpu":
        # identical math, but the gradient flows through jax's tuned TPU
        # flash kernel (Pallas fwd+bwd, no N x N probs materialized)
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )

        def f(q, k, v):
            scale = q.shape[-1] ** -0.5
            out = jax_flash(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                sm_scale=scale,
            )
            return out.transpose(0, 2, 1, 3)

        _, vjp = jax.vjp(f, q, k, v)
        return vjp(g)
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, block_q: int = 512, block_k: int = 512, rows: int = 1):
    """Flash attention over layout (B, N, H, D) -> (B, N, H, D).

    Falls back to the XLA reference for sequence lengths the block tiling
    can't cover evenly (short temporal sequences never reach here — the
    model's "auto" mode routes them to the XLA path directly).
    """
    N = q.shape[1]
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    if N % block_q or N % block_k:
        return attention_reference(q, k, v)
    return _flash(q, k, v, block_q, block_k, rows)
