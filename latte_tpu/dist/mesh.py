"""Device-mesh construction and sharding specs.

The reference's only parallelism is NCCL data parallelism (DDP,
`/root/reference/train.py:125`, `utils.py:216-249`). The TPU-native
equivalent is a `jax.sharding.Mesh` over ICI with named axes and
`NamedSharding` annotations — XLA inserts the gradient reductions.

Axes:
  - ``dp``: data parallel (batch axis).
  - ``sp``: sequence parallel (fused batch·token axis of the DiT
    activations; spatial blocks shard frames, temporal blocks shard
    patches — see `models/dit.py` ``activation_sharding``). Size 1 by
    default; the mesh only carries the axis when sp > 1 so existing
    2-axis specs keep working.
  - ``tp``: tensor parallel (hidden axis of the DiT matmuls) — the mesh
    carries the axis so models can shard attention heads / MLP columns;
    size 1 reproduces the reference's pure-DP behavior.
  - ``ep``: expert parallel (leading expert axis of the MoE FF weights,
    `models/moe.py`). Size 1 by default; the mesh only carries the axis
    when ep > 1.

Multi-host init goes through `jax.distributed.initialize()`
(:func:`initialize_distributed`), replacing torchrun/SLURM rendezvous.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: use all remaining devices
    tp: int = 1
    sp: int = 1  # sequence parallel (activation token axis)
    pp: int = 1  # pipeline parallel (depth axis of the scanned pair stack)
    ep: int = 1  # expert parallel (expert axis of the MoE FF weights)

    def resolve(self, n_devices: int) -> "MeshConfig":
        denom = self.tp * self.sp * self.pp * self.ep
        dp = self.dp if self.dp != -1 else n_devices // denom
        assert dp * denom == n_devices, (
            f"mesh dp{dp}xep{self.ep}xsp{self.sp}xtp{self.tp}xpp{self.pp} != "
            f"{n_devices} devices"
        )
        return MeshConfig(
            dp=dp, tp=self.tp, sp=self.sp, pp=self.pp, ep=self.ep
        )


def make_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[Sequence[Any]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = config.resolve(len(devices))
    # dp outermost; sp/pp axes appear only when used so existing 2-axis
    # specs keep working. pp innermost: GPipe stage hops (ppermute) ride
    # nearest-neighbor ICI links.
    dims, names = [cfg.dp], ["dp"]
    if cfg.ep > 1:
        # ep right after dp: the dispatch/combine all-to-alls between the
        # dp-sharded tokens and ep-sharded experts ride adjacent ICI links
        dims.append(cfg.ep)
        names.append("ep")
    if cfg.sp > 1:
        dims.append(cfg.sp)
        names.append("sp")
    dims.append(cfg.tp)
    names.append("tp")
    if cfg.pp > 1:
        dims.append(cfg.pp)
        names.append("pp")
    arr = np.asarray(devices).reshape(dims)
    return Mesh(arr, axis_names=tuple(names))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch onto the mesh, sharded over the leading (batch) axis.

    Single-process: ``x`` is the global batch, device_put splits it.
    Multi-process: each host passes ONLY ITS OWN rows (global_batch /
    process_count — the loader shards files per process) and the global
    array is assembled from the per-process shards; device_put of a
    "global" array per host would silently drop every row outside that
    host's device offsets."""
    sharding = NamedSharding(mesh, P("dp"))
    if jax.process_count() > 1:
        import numpy as np

        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec() -> P:
    return P("dp")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (ICI intra-slice / DCN inter-slice).

    A no-op on single-process setups; replaces the reference's
    `setup_distributed()` NCCL/SLURM rendezvous (`utils.py:216-249`).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host synchronization point (the reference's `dist.barrier()`
    around checkpointing, `train.py:271`). No-op single-process."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
