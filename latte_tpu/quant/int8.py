"""W8A8 int8 serving path (beyond the reference, which serves fp16/fp32).

TPU v5e's MXU executes int8×int8→int32 matmuls at twice the bf16 rate and
int8 weights halve HBM weight traffic, so the four hot per-token matmuls
of each DiT block (qkv, proj, fc1, fc2) can run W8A8 for serving:

- Weights: symmetric per-output-channel int8, quantized **once** offline
  by :func:`quantize_params` (scales folded out of the matmul).
- Activations: symmetric per-token dynamic int8 — the row-wise max is a
  cheap VPU reduction fused by XLA into the surrounding elementwise chain.
- Accumulation in int32, rescale in fp32, output in the model dtype.

Conditioning/modulation layers (adaLN, final linear, patch embed) stay in
floating point: they are token-count-cheap and zero-init-sensitive.

Usage::

    model = get_model("Latte-XL/2", ..., quantized=True)
    qparams = quantize_params(fp_params)     # offline, once
    out = model.apply({"params": qparams}, x, t)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Dense layers that carry the per-token FLOPs, keyed by their parent
# module scope; everything else stays fp. Covers the core Latte/LatteIMG
# blocks (attn/mlp) and the LatteT2V diffusers-style blocks (attn1/attn2
# self+cross attention, ff feed-forward).
QUANT_TARGETS_BY_PARENT = {
    "attn": ("qkv", "proj"),
    "mlp": ("fc1", "fc2"),
    "attn1": ("to_q", "to_k", "to_v", "to_out"),
    "attn2": ("to_q", "to_k", "to_v", "to_out"),
    "ff": ("net_0_proj", "net_2"),
    # the per-block adaLN modulation dense: its (D, 6D) weight streams as
    # many bytes/step as the four hot matmuls combined once those are int8,
    # and the DDIM step is weight-DMA-bound (docs/tpu_notes.md roofline)
    "spatial": ("adaLN_modulation",),
    "temporal": ("adaLN_modulation",),
}


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization.

    ``w`` has shape (..., in, out) — possibly with a leading scanned-layer
    axis. The scale is computed over the contraction (in) axis only, so it
    has shape (..., 1, out) and broadcasts back exactly.
    """
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return w_i8, scale.astype(jnp.float32)


def int8_matmul(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype: jnp.dtype,
) -> jnp.ndarray:
    """W8A8 matmul: dynamic per-token activation quant, int32 accumulate.

    x (..., in) @ w_i8 (in, out) * scale (1, out) -> (..., out).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ax = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8,
        w_i8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * ax * scale.reshape(-1)).astype(out_dtype)


def int8_matmul_static(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    scale: jnp.ndarray,
    act_scale: jnp.ndarray,
    out_dtype: jnp.dtype,
) -> jnp.ndarray:
    """W8A8 matmul with a CALIBRATED static activation scale.

    The dynamic per-token path costs an extra full HBM read of every matmul
    input (the amax reduce) plus a bf16 materialization before the int8
    cast — measured 5.8 ms of the 23 ms XL/2 DDIM step
    (docs/tpu_notes.md, round-4 int8 trace). With a static per-tensor
    ``act_scale`` (from :func:`calibrate_act_scales`) the quantize is pure
    elementwise work that XLA fuses into the producer, which then writes
    int8 directly — no amax pass, no bf16 round-trip.
    """
    ax = jnp.maximum(act_scale.astype(jnp.float32), 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / ax), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8,
        w_i8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * ax * scale.reshape(-1)).astype(out_dtype)


def int8_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_amax: jnp.ndarray,
    k_amax: jnp.ndarray,
    v_amax: jnp.ndarray,
    out_dtype: jnp.dtype,
    pv_int8: bool = True,
) -> jnp.ndarray:
    """Attention core with int8 matmuls and CALIBRATED per-head scales.

    The static-W8A8 DiT step leaves exactly one compute category in
    floating point: the two attention matmuls (QKᵀ and P·V — together the
    N²·D FLOPs of each block). v5e's MXU runs int8×int8→int32 at 2× the
    bf16 rate, so quantizing them is the remaining arithmetic lever
    (docs/tpu_notes.md, round-4 int8 conclusion). Layout (B, N, H, D),
    per-head amax of shape (H,) calibrated offline (the same static-scale
    recipe as :func:`int8_matmul_static` — the quantize of q/k/v fuses
    into the qkv dense's dequant epilogue, which then writes int8).

    Softmax runs in fp32 on the rescaled int32 logits. For P·V the
    probabilities quantize at a PER-ROW scale (rowmax/127, folded into the
    dequant multiplier): a fixed 127 scale would zero every probability
    below ~1/254, silently dropping most of the mass of diffuse rows (a
    near-uniform row at N=1024 quantizes to all zeros) — with the row
    maximum as the scale, each row keeps its full relative precision and
    needs no calibration (softmax guarantees rowmax >= 1/N > 0). Set
    ``pv_int8=False`` to keep P·V in the model dtype (bf16) when even that
    rounding is not acceptable — QKᵀ (where the scale headroom is) stays
    int8 either way.
    """
    B, N, H, D = q.shape
    qs = (jnp.maximum(q_amax.astype(jnp.float32), 1e-8) / 127.0).reshape(1, 1, H, 1)
    ks = (jnp.maximum(k_amax.astype(jnp.float32), 1e-8) / 127.0).reshape(1, 1, H, 1)

    def to_i8(x, s):
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(
            jnp.int8
        )

    q_i8 = to_i8(q, qs)
    k_i8 = to_i8(k, ks)
    acc = jnp.einsum(
        "bnhd,bmhd->bhnm", q_i8, k_i8, preferred_element_type=jnp.int32
    )
    # fold the per-head q/k scales and the 1/sqrt(D) softmax scale into one
    # fp32 multiplier per head
    logit_scale = (qs * ks).reshape(1, H, 1, 1) * (D**-0.5)
    probs = jax.nn.softmax(acc.astype(jnp.float32) * logit_scale, axis=-1)
    if pv_int8:
        vs = (jnp.maximum(v_amax.astype(jnp.float32), 1e-8) / 127.0).reshape(
            1, 1, H, 1
        )
        v_i8 = to_i8(v, vs)
        # per-row probability scale: rowmax maps to 127, so diffuse rows
        # keep relative precision instead of rounding to zero
        p_max = jnp.max(probs, axis=-1, keepdims=True)  # (B, H, N, 1), >= 1/N
        p_i8 = jnp.round(probs * (127.0 / p_max)).astype(jnp.int8)
        acc2 = jnp.einsum(
            "bhnm,bmhd->bnhd", p_i8, v_i8, preferred_element_type=jnp.int32
        )
        # fold the per-row 1/127 p-scale back in: p_max is (B, H, N, 1) ->
        # the output layout's (B, N, H, 1)
        row_scale = jnp.transpose(p_max[..., 0], (0, 2, 1))[..., None]
        out = acc2.astype(jnp.float32) * (row_scale / 127.0) * vs
        return out.astype(out_dtype)
    pv = jnp.einsum(
        "bhnm,bmhd->bnhd",
        probs.astype(out_dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return pv.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_matmul_ste(x: jnp.ndarray, w: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """Quantized-training matmul: W8A8 forward from FP MASTER weights,
    straight-through backward.

    Forward quantizes ``w`` per-output-channel and ``x`` per-token on the
    fly and runs the int8×int8→int32 MXU matmul (2× the bf16 rate on v5e);
    backward ignores both quantizers (the straight-through estimator) and
    computes exact FP gradients ``dx = g·wᵀ``, ``dw = xᵀ·g`` — so the
    optimizer updates full-precision masters and checkpoints stay
    interchangeable with the fp path. This is the standard QAT recipe: the
    forward sees exactly the arithmetic the int8 serving path will run.
    """
    w_i8, scale = quantize_weight(w)
    return int8_matmul(x, w_i8, scale, out_dtype)


def _int8_matmul_ste_fwd(x, w, out_dtype):
    return int8_matmul_ste(x, w, out_dtype), (x, w)


def _int8_matmul_ste_bwd(out_dtype, res, g):
    x, w = res
    # gradients bypass the quantizers; dots run in the compute dtype with
    # fp32 accumulation, results cast back to the primal dtypes
    dx = jax.lax.dot_general(
        g,
        jnp.asarray(w, g.dtype),
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1]).astype(g.dtype)
    g2 = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(
        x2,
        g2,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


int8_matmul_ste.defvjp(_int8_matmul_ste_fwd, _int8_matmul_ste_bwd)


def _is_target(path) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    # e.g. blocks/spatial/attn/qkv/kernel — the parent module must be an
    # attention/MLP block (x_embedder's Dense is also named "proj")
    return (
        len(keys) >= 3
        and keys[-1] == "kernel"
        and keys[-2] in QUANT_TARGETS_BY_PARENT.get(keys[-3], ())
    )


def quantize_params(params, act_amax=None):
    """fp params tree -> quantized tree for a ``quantized=True`` model.

    Each targeted ``{".../qkv|proj|fc1|fc2": {"kernel": w}}`` becomes
    ``{"kernel_i8": int8, "kernel_scale": f32}``; biases and every other
    leaf pass through unchanged.

    With ``act_amax`` (the "calib" collection from a ``quantized="calib"``
    run — see :func:`calibrate_act_amax`), each target additionally gets an
    ``act_scale`` leaf holding the calibrated activation amax, producing
    params for ``quantized="static"`` serving (static per-tensor activation
    scales — no dynamic amax pass at serve time).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        keys = [p.key for p in path]
        node = out
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        if _is_target(path):
            w_i8, scale = quantize_weight(leaf)
            node["kernel_i8"] = w_i8
            node["kernel_scale"] = scale
            if act_amax is not None:
                node["act_scale"] = _lookup_amax(act_amax, keys[:-1])
        else:
            node[keys[-1]] = leaf
    if act_amax is not None:
        _inject_attention_scales(out, act_amax, ())
    return out


_ATTN_AMAX_KEYS = ("q_amax", "k_amax", "v_amax")


def _inject_attention_scales(out, act_amax, path):
    """Fold sown int8-attention amax into ``{q,k,v}_scale`` param leaves.

    A model built with ``int8_attention=True`` sows per-head q/k/v amax
    (shape (H,), scan-stacked to (n_pairs, H)) into the "calib" collection
    inside each Attention scope; the ``quantized="static"`` model declares
    matching ``q_scale``/``k_scale``/``v_scale`` params there. When the
    calib collection has no attention entries (int8_attention off) this is
    a no-op, so fp trees and dense-only calibrations pass through unchanged.
    """
    for key, val in act_amax.items():
        if key in _ATTN_AMAX_KEYS:
            node = out
            for p in path:
                node = node.setdefault(p, {})
            if isinstance(val, (tuple, list)):  # default sow() tuple append
                val = jnp.stack([jnp.asarray(x) for x in val]).max(axis=0)
            node[key.replace("_amax", "_scale")] = jnp.asarray(val, jnp.float32)
        elif isinstance(val, dict):
            _inject_attention_scales(out, val, path + (key,))


def _lookup_amax(act_amax, module_keys):
    """Fetch the sown act_amax for a module path from a calib collection."""
    node = act_amax
    for k in module_keys:
        if k not in node:
            raise KeyError(
                f"calibration collection has no entry for {'/'.join(module_keys)} "
                f"(missing {k!r}); run the model with quantized='calib' and "
                f"mutable=['calib'] over representative inputs first"
            )
        node = node[k]
    v = node["act_amax"]
    if isinstance(v, (tuple, list)):  # default sow() appends into a tuple
        v = jnp.stack([jnp.asarray(x) for x in v]).max(axis=0)
    return jnp.asarray(v, jnp.float32)


def calibrate_act_amax(apply_fn, *call_args, **call_kwargs):
    """Run one calibration forward and return the merged "calib" collection.

    ``apply_fn`` is a closure over ``model.apply`` built with a
    ``quantized="calib"`` model; it must accept ``mutable=["calib"]`` via
    kwargs. Call repeatedly over representative inputs (e.g. several DDIM
    timesteps) and merge with :func:`merge_amax`.
    """
    _, variables = apply_fn(*call_args, mutable=["calib"], **call_kwargs)
    return variables["calib"]


def merge_amax(a, b):
    """Elementwise max of two calib collections (pytrees of amax scalars)."""
    if a is None:
        return b
    return jax.tree_util.tree_map(jnp.maximum, a, b)
