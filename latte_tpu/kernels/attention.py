"""Pallas flash attention for TPU.

Fills the reference's `attention_mode ∈ {math, flash, xformers}` kernel slot
(`/root/reference/models/latte.py:53-73`) with a TPU-native online-softmax
kernel: Q blocks stream through VMEM while K/V are consumed block-by-block,
so the N×N score matrix is never materialized in HBM.

Two token layouts matter for Latte (SURVEY.md §5.7): long spatial sequences
(HW/p² tokens, e.g. 1024 @ 256²) — where this kernel wins — and short
temporal sequences (F = 16) — where the fused XLA path is faster; the model
dispatches between them ("auto" mode).

The backward pass is a pair of Pallas kernels (standard flash-attention
backward recurrence): the forward additionally emits the per-row
logsumexp; the backward recomputes probabilities block-by-block from it,
so neither pass ever materializes the N×N score matrix. `dq` parallelizes
over Q blocks (inner loop over K), `dk/dv` over K blocks (inner loop
over Q). Set ``bwd_impl="xla"`` to fall back to XLA autodiff of the
reference attention.
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

__all__ = ["flash_attention", "flash_attention_int8", "attention_reference"]

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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, scale: float):
    """Online-softmax attention for R independent rows at once.

    Batching R (batch·head) rows per grid invocation amortizes the
    per-invocation overhead that dominates at Latte's shapes (head_dim 72,
    N 1024): 2048 tiny invocations -> BH/R larger ones.
    """
    # Matmul inputs stay in the model dtype (bf16 on the hot path) so the
    # MXU runs at full bf16 rate; `preferred_element_type=f32` keeps the
    # accumulators fp32. Softmax statistics are fp32 throughout.
    q = (q_ref[...].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (R, bq, D)
    seq_k = k_ref.shape[1]
    nk = seq_k // block_k
    R, bq, D = q.shape

    acc = jnp.zeros((R, bq, D), jnp.float32)
    m = jnp.full((R, bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((R, bq, 1), jnp.float32)

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[:, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[:, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, bq, bk) fp32
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype),
            v_blk,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return acc, m_new, l

    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc, m, l))
    o_ref[...] = (acc / l).astype(o_ref.dtype)
    # per-row logsumexp of the scaled scores — the backward's softmax key.
    # Kept 3D with a trailing singleton: TPU block shapes need the last two
    # dims (8,128)-aligned OR equal to the array dims; (bq, 1) qualifies
    # while a 2D (rows, bq) block would constrain `rows` to multiples of 8.
    lse_ref[...] = m + jnp.log(l)


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
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            jax.ShapeDtypeStruct((BH, N, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
            pl.BlockSpec((rows, N, D), lambda b, i: (b, 0, 0), **kw),
            pl.BlockSpec((rows, N, D), lambda b, i: (b, 0, 0), **kw),
        ],
        out_specs=(
            pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
            pl.BlockSpec((rows, block_q, 1), lambda b, i: (b, i, 0), **kw),
        ),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3), lse


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k: int, scale: float,
):
    """dQ for one Q block: inner loop over K blocks.

    ds = p ∘ (dO·Vᵀ − Δ), dq = scale · ds·K with p recomputed from the
    forward logsumexp (flash-attention backward recurrence).
    """
    # Same rounding as the forward: q is scaled in fp32 then cast back to
    # the model dtype, so exp(s - lse) reproduces the forward's p exactly;
    # matmuls run at native (bf16) MXU rate with fp32 accumulation.
    qs = (q_ref[...].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (R, bq, D)
    do = do_ref[...]
    lse = lse_ref[...].astype(jnp.float32)  # (R, bq, 1)
    delta = delta_ref[...].astype(jnp.float32)
    nk = k_ref.shape[1] // block_k

    def body(j, acc):
        k_blk = k_ref[:, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[:, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            qs, k_blk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, bq, bk) fp32
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, bq, bk)
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        acc = acc + jax.lax.dot_general(
            ds, k_blk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return acc

    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros(qs.shape, jnp.float32))
    dq_ref[...] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q: int, scale: float,
):
    """dK/dV for one K block: inner loop over Q blocks.

    dv = pᵀ·dO, dk = scale · dsᵀ·Q accumulated across all Q blocks.
    """
    k = k_ref[...]  # (R, bk, D)
    v = v_ref[...]
    nq = q_ref.shape[1] // block_q
    shape_f32 = (k.shape[0], k.shape[1], k.shape[2])

    def body(i, carry):
        dk, dv = carry
        # scaled-q with the forward's exact rounding (fp32 scale -> cast)
        qs_blk = (
            q_ref[:, pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
        ).astype(q_ref.dtype)
        do_blk = do_ref[:, pl.ds(i * block_q, block_q), :]
        lse_blk = lse_ref[:, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        delta_blk = delta_ref[:, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qs_blk, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, bq, bk) fp32
        p = jnp.exp(s - lse_blk)
        pc = p.astype(do_blk.dtype)
        dv = dv + jax.lax.dot_general(
            pc, do_blk, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, bk, D)
        dp = jax.lax.dot_general(
            do_blk, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta_blk)).astype(qs_blk.dtype)
        # dK = dSᵀ·Qs (Qs already carries the softmax scale)
        dk = dk + jax.lax.dot_general(
            ds, qs_blk, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, nq, body,
        (jnp.zeros(shape_f32, jnp.float32), jnp.zeros(shape_f32, jnp.float32)),
    )
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, out, lse, g, block_q: int, block_k: int, interpret: bool, rows: int
):
    B, N, H, D = q.shape
    scale = D**-0.5
    qr = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kr = k.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    vr = v.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    dor = g.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    outr = out.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    # Δ_i = Σ_d dO_id · O_id — cheap rowwise reduction; leave it to XLA
    delta = jnp.sum(
        dor.astype(jnp.float32) * outr.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, N, 1)

    BH = B * H
    while rows > 1 and BH % rows:
        rows //= 2
    kw = {} if _VMEM is None else {"memory_space": _VMEM}

    full = lambda b, i: (b, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        grid=(BH // rows, N // block_q),
        in_specs=[
            pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
            pl.BlockSpec((rows, N, D), full, **kw),
            pl.BlockSpec((rows, N, D), full, **kw),
            pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
            pl.BlockSpec((rows, block_q, 1), lambda b, i: (b, i, 0), **kw),
            pl.BlockSpec((rows, block_q, 1), lambda b, i: (b, i, 0), **kw),
        ],
        out_specs=pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
        interpret=interpret,
    )(qr, kr, vr, dor, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((BH, N, D), k.dtype),
            jax.ShapeDtypeStruct((BH, N, D), v.dtype),
        ),
        grid=(BH // rows, N // block_k),
        in_specs=[
            pl.BlockSpec((rows, N, D), full, **kw),
            pl.BlockSpec((rows, block_k, D), lambda b, j: (b, j, 0), **kw),
            pl.BlockSpec((rows, block_k, D), lambda b, j: (b, j, 0), **kw),
            pl.BlockSpec((rows, N, D), full, **kw),
            pl.BlockSpec((rows, N, 1), full, **kw),
            pl.BlockSpec((rows, N, 1), full, **kw),
        ],
        out_specs=(
            pl.BlockSpec((rows, block_k, D), lambda b, j: (b, j, 0), **kw),
            pl.BlockSpec((rows, block_k, D), lambda b, j: (b, j, 0), **kw),
        ),
        interpret=interpret,
    )(qr, kr, vr, dor, lse, delta)

    back = lambda a: a.reshape(B, H, N, D).transpose(0, 2, 1, 3)
    return back(dq), back(dk), back(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, block_q, block_k, rows, bwd_impl):
    interpret = jax.default_backend() != "tpu"
    out, _ = _flash_forward(q, k, v, block_q, block_k, interpret, rows=rows)
    return out


def _flash_fwd(q, k, v, block_q, block_k, rows, bwd_impl):
    interpret = jax.default_backend() != "tpu"
    out, lse = _flash_forward(q, k, v, block_q, block_k, interpret, rows=rows)
    # the xla fallback backward only needs (q, k, v) — don't pin a full
    # activation (out) + lse through the backward for nothing
    res = (q, k, v, out, lse) if bwd_impl == "pallas" else (q, k, v, None, None)
    return out, res


def _flash_bwd(block_q, block_k, rows, bwd_impl, res, g):
    q, k, v, out, lse = res
    if bwd_impl == "pallas":
        interpret = jax.default_backend() != "tpu"
        return _flash_backward(
            q, k, v, out, lse, g, block_q, block_k, interpret, rows
        )
    # "xla": autodiff of the mathematically identical fused attention
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _flash_int8_kernel(
    q_ref, k_ref, v_ref, sc_ref, o_ref, *, block_k: int, pv_int8: bool
):
    """Online-softmax attention with int8 matmuls (serving forward).

    q/k (and v when ``pv_int8``) arrive PRE-QUANTIZED int8 at calibrated
    per-head scales — the quantize fuses into the qkv dense's dequant
    epilogue outside the kernel, exactly like the fused-XLA int8 core
    (`quant/int8.int8_attention`). Both matmuls then run int8×int8→int32
    on the MXU (2× the bf16 rate on v5e) and the K/V stream through VMEM
    at half the bytes. ``sc_ref`` carries two fp32 scalars per (batch·head)
    row: the folded logit scale qs·ks·D^-1/2 and the v dequant scale.

    P·V quantizes the probabilities at a per-(row, K-block) scale — the
    flash-local analogue of the fused path's per-row scale: within each
    K block the row's block-max maps to 127, so diffuse rows keep relative
    precision instead of rounding to zero, and the scale folds into the
    fp32 accumulation (`acc · blockmax/127 · vs`). The fp32 softmax
    statistics (m, l) come from the UNQUANTIZED probabilities, so the
    normalization matches the fused int8 core's semantics.
    """
    q = q_ref[...]  # (R, bq, D) int8
    seq_k = k_ref.shape[1]
    nk = seq_k // block_k
    R, bq, _ = q.shape
    D = o_ref.shape[-1]
    logit_scale = sc_ref[:, 0].reshape(R, 1, 1)
    v_scale = sc_ref[:, 1].reshape(R, 1, 1)

    acc = jnp.zeros((R, bq, D), jnp.float32)
    m = jnp.full((R, bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((R, bq, 1), jnp.float32)

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[:, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[:, pl.ds(j * block_k, block_k), :]
        s32 = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (R, bq, bk) int32
        s = s32.astype(jnp.float32) * logit_scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # in (0, 1]
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if pv_int8:
            p_max = jnp.maximum(
                jnp.max(p, axis=-1, keepdims=True), 1e-30
            )  # (R, bq, 1)
            p_i8 = jnp.round(p * (127.0 / p_max)).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8,
                v_blk,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (p_max / 127.0)
        else:
            pv = jax.lax.dot_general(
                p.astype(v_blk.dtype),
                v_blk,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        acc = acc * alpha + pv
        return acc, m_new, l

    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc, m, l))
    out = acc / l
    if pv_int8:
        out = out * v_scale
    o_ref[...] = out.astype(o_ref.dtype)


def flash_attention_int8(
    q, k, v, q_amax, k_amax, v_amax, out_dtype, *,
    pv_int8: bool = True,
    block_q: int = 1024, block_k: int = 1024, rows: int = 1,
):
    """int8 flash attention with calibrated per-head scales (serving only).

    Layout (B, N, H, D) -> (B, N, H, D); ``{q,k,v}_amax`` of shape (H,)
    come from the same calibration pass as `quant/int8.int8_attention` —
    this kernel is its flash-tiled sibling for the long sequences that the
    model's "auto" mode routes to the flash kernel (N >= flash_min_n, e.g.
    the 1024-token spatial attention of T2V 512²,
    `/root/reference/configs/t2x/t2v_sample.yaml:19-28`). Forward-only:
    the int8 core is a serving arithmetic, training differentiates the
    floating-point paths.

    Sequence lengths the block tiling can't cover fall back to the fused
    int8 core (which is also where short sequences route — the "auto"
    dispatch never sends N < flash_min_n here).
    """
    N = q.shape[1]
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    if N % block_q or N % block_k:
        from latte_tpu.quant.int8 import int8_attention

        return int8_attention(
            q, k, v, q_amax, k_amax, v_amax, out_dtype, pv_int8=pv_int8
        )

    B, _, H, D = q.shape
    qs = jnp.maximum(q_amax.astype(jnp.float32), 1e-8) / 127.0  # (H,)
    ks = jnp.maximum(k_amax.astype(jnp.float32), 1e-8) / 127.0
    vs = jnp.maximum(v_amax.astype(jnp.float32), 1e-8) / 127.0

    def to_i8(x, s):
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) / s.reshape(1, 1, H, 1)), -127, 127
        ).astype(jnp.int8)

    q_i8 = to_i8(q, qs)
    k_i8 = to_i8(k, ks)
    v_in = to_i8(v, vs) if pv_int8 else v
    # (B, N, H, D) -> (B*H, N, D) rows, like the bf16 kernel
    fold = lambda a: a.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    # per-(batch·head) fp32 [logit_scale, v_scale] pairs
    sc = jnp.tile(
        jnp.stack([qs * ks * (D**-0.5), vs], axis=-1), (B, 1)
    )  # (B*H, 2)

    BH = B * H
    while rows > 1 and BH % rows:
        rows //= 2
    grid = (BH // rows, N // block_q)
    kw = {} if _VMEM is None else {"memory_space": _VMEM}
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_flash_int8_kernel, block_k=block_k, pv_int8=pv_int8),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
            pl.BlockSpec((rows, N, D), lambda b, i: (b, 0, 0), **kw),
            pl.BlockSpec((rows, N, D), lambda b, i: (b, 0, 0), **kw),
            pl.BlockSpec((rows, 2), lambda b, i: (b, 0), **kw),
        ],
        out_specs=pl.BlockSpec((rows, block_q, D), lambda b, i: (b, i, 0), **kw),
        interpret=interpret,
    )(fold(q_i8), fold(k_i8), fold(v_in), sc)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


def flash_attention(
    q, k, v, *,
    block_q: int = 1024, block_k: int = 1024, rows: int = 1,
    bwd_impl: str = "pallas",
):
    """Flash attention over layout (B, N, H, D) -> (B, N, H, D).

    Falls back to the XLA reference for sequence lengths the block tiling
    can't cover evenly (short temporal sequences never reach here — the
    model's "auto" mode routes them to the XLA path directly).
    ``bwd_impl``: "pallas" (own flash backward kernels) | "xla".
    """
    N = q.shape[1]
    block_q = min(block_q, N)
    block_k = min(block_k, N)
    if N % block_q or N % block_k:
        return attention_reference(q, k, v)
    return _flash(q, k, v, block_q, block_k, rows, bwd_impl)
