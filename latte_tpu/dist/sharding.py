"""Parameter sharding rules: data + tensor parallelism for the DiT stacks.

The reference only does data parallelism (SURVEY.md §2.8); the TPU rebuild
exposes a ``tp`` mesh axis as well. The rules implement the Megatron
pattern on the scanned parameter layout:

- qkv / fc1 / to_q,k,v / net_0_proj kernels: column-split (output dim over
  ``tp``) — each shard computes its own attention heads / MLP columns;
- proj / fc2 / to_out / net_2 kernels: row-split (input dim over ``tp``) —
  XLA inserts the psum over ``tp`` after the matmul;
- everything else replicated; batch sharded over ``dp``.

Under `jit` with these in_shardings, SPMD propagation partitions every
block matmul 1/tp per chip with exactly one all-reduce per attention and
one per MLP — collectives ride ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix key, which dim of the kernel is sharded): -1 = last (column
# parallel), -2 = second-to-last (row parallel).
_COLUMN_KEYS = ("qkv", "fc1", "to_q", "to_k", "to_v", "net_0_proj")
_ROW_KEYS = ("proj", "fc2", "to_out", "net_2")


def _spec_for(path_keys, leaf) -> P:
    rank = leaf.ndim
    # only shard inside the scanned transformer blocks
    if "blocks" not in path_keys:
        return P()
    name = None
    for k in path_keys:
        if k in _COLUMN_KEYS or k in _ROW_KEYS:
            name = k
    is_kernel = path_keys[-1] == "kernel"
    is_bias = path_keys[-1] == "bias"
    if name in _COLUMN_KEYS:
        if is_kernel:
            return P(*([None] * (rank - 1) + ["tp"]))
        if is_bias:
            return P(*([None] * (rank - 1) + ["tp"]))
    if name in _ROW_KEYS and is_kernel and rank >= 2:
        return P(*([None] * (rank - 2) + ["tp", None]))
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree implementing dp-replicated, tp-split params."""

    def rule(path, leaf):
        keys = [
            getattr(p, "key", getattr(p, "name", str(p)))
            for p in path
        ]
        return NamedSharding(mesh, _spec_for(keys, leaf))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh):
    """Place params on the mesh according to the TP rules."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )


def _ep_axis_index(path_keys) -> int:
    """Expert axis position of a MoE weight: the pair scan stacks an
    ``n_pairs`` axis in front (`models/dit.py` PairScan), pushing the
    expert axis from 0 to 1."""
    return 1 if "blocks" in path_keys else 0


def ep_param_shardings(params: Any, mesh: Mesh):
    """Expert parallelism: MoE expert weights shard over ``ep``.

    The expert-stacked leaves of `models/moe.py` (``wi``/``wo``/``bi``/
    ``bo``, paths containing ``moe``) split their expert axis over the
    mesh's ``ep`` axis — each device holds E/ep experts. Tokens stay
    dp-sharded; under jit GSPMD turns the dispatch/combine einsums into
    the all-to-all pair around the expert matmuls. Routers are (D, E) and
    tiny — they replicate, as does everything outside the MoE (composed
    with the Megatron TP rules via ``_spec_for``).
    """
    ep = mesh.shape["ep"]

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        shape = getattr(leaf, "shape", ())
        if "moe" in keys and keys[-1] in ("wi", "wo", "bi", "bo"):
            ax = _ep_axis_index(keys)
            if len(shape) > ax and shape[ax] % ep == 0:
                spec = [None] * len(shape)
                spec[ax] = "ep"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, _spec_for(keys, leaf))

    return jax.tree_util.tree_map_with_path(rule, params)


def fsdp_param_shardings(params: Any, mesh: Mesh):
    """ZeRO-3 / FSDP: the weights themselves shard over ``dp``.

    Each leaf's largest not-already-sharded, dp-divisible axis is split
    over ``dp`` on top of the TP rules — 1/dp parameter (and EMA) memory
    per chip. Under jit, GSPMD all-gathers a block's weights just before
    its matmuls and reduce-scatters the gradients — the gather rides ICI
    and overlaps with the previous block's compute (XLA's latency-hiding
    scheduler), the classic FSDP schedule. Leaves too small to split
    stay replicated (their memory is negligible).
    """
    dp = mesh.shape["dp"]

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        # only the scanned transformer blocks carry enough mass to be
        # worth sharding; splitting the small embedder/final-layer leaves
        # buys nothing and makes SPMD reshard their activations/grads
        if "blocks" not in keys:
            return NamedSharding(mesh, P())
        base = _spec_for(keys, leaf)
        shape = getattr(leaf, "shape", ())
        spec = list(tuple(base) + (None,) * (len(shape) - len(tuple(base))))
        # expert parallelism composes: when the mesh carries an ep axis,
        # MoE expert weights pin their expert axis to it first, and the
        # largest-axis dp rule below then picks among the remaining dims
        if (
            "ep" in mesh.shape
            and "moe" in keys
            and keys[-1] in ("wi", "wo", "bi", "bo")
        ):
            ax = _ep_axis_index(keys)
            if len(shape) > ax and spec[ax] is None and shape[ax] % mesh.shape["ep"] == 0:
                spec[ax] = "ep"
        # adaLN_modulation kernels take the generic largest-axis rule, which
        # lands on the OUTPUT (6D) dim. Input-dim sharding looks tempting
        # (the (B, 6D) modulation output is a tiny broadcast conditioner)
        # but is wrong: the backward dc = dmod @ W^T then emits dc with its
        # FEATURE dim dp-sharded while the activation constraint wants the
        # batch axis dp x sp-sharded — a transition GSPMD can only do by
        # involuntary full rematerialization (seen as spmd_partitioner.cc
        # warnings inside the scan body). Output-dim sharding makes that
        # dot all-gather W instead — the standard FSDP schedule — and dc
        # comes out batch-sharded, matching its consumer.
        best, best_size = None, 0
        for axis, size in enumerate(shape):
            if spec[axis] is None and size % dp == 0 and size > best_size:
                best, best_size = axis, size
        if best is not None and best_size >= dp:
            spec[best] = "dp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def fsdp_opt_shardings(opt_state: Any, mesh: Mesh):
    """ZeRO-3 optimizer moments: the SAME rule as the FSDP params.

    optax's mu/nu trees mirror the param tree, so the path-based FSDP rule
    lands each moment on exactly its parameter's sharding — no resharding
    between the update and the next step (a mismatched axis choice, e.g.
    ZeRO-1's largest-axis rule, makes SPMD fully rematerialize those
    leaves every step). Scalars (count) replicate.
    """
    return fsdp_param_shardings(opt_state, mesh)


def pp_param_shardings(params: Any, mesh: Mesh, zero1: bool = False):
    """Pipeline parallelism: the scanned pair stack shards by DEPTH.

    The ``blocks`` subtree's leaves carry the stacked ``n_pairs`` leading
    axis — `P("pp")` there matches gpipe's shard_map ``in_specs``
    (`dist/pipeline.py`), so the pipelined step consumes the parameters
    (and writes updates/EMA) with zero resharding. Everything outside the
    pair stack (embedders, final layer) is tiny and replicates. The same
    rule shards the Adam moments (optax's mu/nu mirror the param tree);
    ``zero1`` additionally splits each moment's largest REMAINING axis
    over ``dp`` — ZeRO-1 composed on top of the depth sharding, instead of
    `zero1_opt_shardings`' dp-only rule whose axis choice would fight the
    pp-sharded params every step.
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape["dp"]

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        shape = getattr(leaf, "shape", ())
        spec = [None] * len(shape)
        if "blocks" in keys and shape and shape[0] % pp == 0:
            spec[0] = "pp"
        if zero1 and dp > 1:
            best, best_size = None, 0
            for axis, size in enumerate(shape):
                if spec[axis] is None and size % dp == 0 and size > best_size:
                    best, best_size = axis, size
            if best is not None and best_size >= dp:
                spec[best] = "dp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(rule, params)


def zero1_opt_shardings(opt_state: Any, mesh: Mesh):
    """ZeRO-1: shard optimizer moments over the ``dp`` axis.

    Adam's mu/nu are elementwise, so any partitioning is valid; splitting
    the leading axis over dp makes XLA reduce-scatter gradients into the
    update and all-gather fresh params — 1/dp optimizer memory per chip.
    Leaves whose leading axis doesn't divide dp stay replicated.
    """
    dp = mesh.shape["dp"]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        # shard the largest dp-divisible axis (scanned params' leading axis
        # is the small n_pairs dim; the hidden dims are the big ones)
        best, best_size = None, 0
        for axis, size in enumerate(shape):
            if size % dp == 0 and size > best_size:
                best, best_size = axis, size
        if best is None or best_size < dp:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = "dp"
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(rule, opt_state)
