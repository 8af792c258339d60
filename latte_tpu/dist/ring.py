"""Ring attention: exact attention over a token axis sharded across chips.

Scaling beyond the reference (which runs attention whole on one GPU,
`/root/reference/models/latte.py:53-73`): when a single sequence is too
long for one chip's HBM — very long videos, or high-res spatial grids —
shard the token axis over a mesh axis and rotate K/V shards around the
ring with `lax.ppermute` while each device accumulates its local Q block's
attention in online-softmax form. The N×N score matrix never materializes
globally; per-step transfers are the K/V shards riding ICI, fully
overlappable with the block matmuls by XLA's latency-hiding scheduler.

Built from differentiable primitives (`lax.scan` + `ppermute` + jnp), so
`jax.grad` through it yields the ring backward (reverse-rotation of
gradients) for free — no custom VJP to maintain.

Use :func:`ring_attention` inside `shard_map`, or the convenience wrapper
:func:`ring_attention_sharded` with a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["ring_attention", "ring_attention_sharded"]


def _block_attn_lse(q, k, v):
    """Attention of a Q block against one K/V block, with logsumexp.

    Layout (B, Nq, H, D) x (B, Nk, H, D) -> out (B, Nq, H, D),
    lse (B, Nq, H, 1) of the scaled scores (softmax statistics in fp32).
    """
    D = q.shape[-1]
    scale = D**-0.5
    s = jnp.einsum(
        "bnhd,bmhd->bhnm",
        (q.astype(jnp.float32) * scale),
        k.astype(jnp.float32),
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhnm,bmhd->bnhd", (p / l).astype(v.dtype), v)
    lse = (m + jnp.log(l)).squeeze(-1).transpose(0, 2, 1)[..., None]  # (B,Nq,H,1)
    return out, lse


def ring_attention(q, k, v, *, axis_name: str):
    """Exact attention with the token axis sharded over ``axis_name``.

    Call inside ``shard_map``: q/k/v are the per-device shards,
    layout (B, N_local, H, D). Returns the local output shard.
    """
    n = jax.lax.axis_size(axis_name)
    out, lse = _block_attn_lse(q, k, v)  # local block first: no -inf init
    if n == 1:
        return out
    perm = [(j, (j + 1) % n) for j in range(n)]
    # the running accumulator stays fp32 across the ring: rescaling a bf16
    # accumulator every step compounds ~2^-8 rounding per merge
    out = out.astype(jnp.float32)

    def step(carry, _):
        out, lse, kc, vc = carry
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        o_i, lse_i = _block_attn_lse(q, kc, vc)
        # merge two normalized partials: out' = Σ out_j · exp(lse_j − lse')
        lse_new = jnp.logaddexp(lse, lse_i)
        out = out * jnp.exp(lse - lse_new) + o_i.astype(jnp.float32) * jnp.exp(
            lse_i - lse_new
        )
        return (out, lse_new, kc, vc), None

    (out, lse, _, _), _ = jax.lax.scan(step, (out, lse, k, v), None, length=n - 1)
    return out.astype(v.dtype)


def ring_attention_sharded(q, k, v, mesh, axis: str = "sp"):
    """Shard q/k/v token axis (dim 1) over ``axis`` and run ring attention.

    Layout (B, N, H, D) with N divisible by the axis size. When the mesh
    also carries ``dp``/``tp`` axes, the batch dim shards over dp and the
    head dim over tp — replicating them here would make shard_map
    all-gather the full global batch onto every device, a dp-fold memory
    blowup in exactly the long-sequence regime this op exists for.
    """
    names = set(mesh.axis_names)
    B, N, H, _ = q.shape
    if N % mesh.shape[axis] != 0:
        raise ValueError(
            f"ring attention: token axis {N} not divisible by mesh axis "
            f"'{axis}' of size {mesh.shape[axis]}"
        )
    # only shard batch/head dims when they actually divide the axis —
    # an indivisible spec would error inside shard_map instead of simply
    # leaving that dim replicated
    dp_ok = "dp" in names and B % mesh.shape["dp"] == 0 and mesh.shape["dp"] > 1
    tp_ok = "tp" in names and H % mesh.shape["tp"] == 0 and mesh.shape["tp"] > 1
    spec = P(
        "dp" if dp_ok else None,
        axis,
        "tp" if tp_ok else None,
        None,
    )
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
