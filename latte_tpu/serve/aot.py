"""Ahead-of-time compiled serving artifacts (`jax.export` / StableHLO).

A production-serving capability beyond the reference (whose serving path
re-traces the model in every Python process —
`/root/reference/sample/sample.py:39-126`): the entire denoising
trajectory — model forward, CFG split, scheduler algebra, the full
`lax.scan` over timesteps — is exported ONCE to a serialized StableHLO
artifact. A serving host then needs only the artifact plus an orbax
weight checkpoint: no model code, no config parsing, no Python-side
retracing — `deserialize(blob).call(params, z, y, rng)`.

Why this is the TPU-native shape of "deployment":

- StableHLO is XLA's stable, versioned exchange format; an artifact
  exported on a CPU build machine lowers for TPU (``platforms`` carries
  multi-platform lowerings in one blob) and compiles on the serving
  fleet's first call, after which XLA's persistent compilation cache
  makes restarts free.
- Weights stay OUT of the artifact: ``params`` is a call argument, so
  one artifact serves every checkpoint of the same architecture, and the
  serialized blob stays ~MBs (HLO only, no GBs of constants baked in —
  the same rule the driver entry point follows).
- The artifact pins the calling convention: shapes, dtypes, and the
  in/out shardings it was exported under. `jax.export` refuses a
  mismatched call instead of silently recompiling something else.

Artifact layout: a single file — 8-byte magic ``LTPUAOT1``, a
varint-free 4-byte little-endian header-length, a JSON header (model
name, shapes, sample method, CFG, creation metadata), then the
`jax.export` serialization bytes.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export
from jax.sharding import NamedSharding, PartitionSpec as P

AOT_SUFFIX = ".ltpu-aot"
_MAGIC = b"LTPUAOT1"


def _build_sample_impl(model, config, diffusion):
    """(params, z, y, rng) -> final latents — the SAME construction as
    the live sampler (`sample/sample.py build_sample_impl`) with
    loop="scan", the only mode that makes sense AOT (the trajectory must
    live inside the exported program)."""
    from latte_tpu.sample.sample import build_sample_impl

    return build_sample_impl(model, config, diffusion, loop="scan")


def export_sampler(
    model,
    config,
    diffusion,
    params: Any,
    *,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    tensor_parallel: int = 1,
    block_cache: Optional[Tuple[int, int]] = None,
) -> Tuple[jax_export.Exported, dict]:
    """Export the full sampling trajectory for ``model`` as StableHLO.

    ``params`` may be real weights or a `jax.eval_shape` pytree — only
    shapes/dtypes matter. ``platforms`` defaults to ("tpu", "cpu"): the
    artifact carries both lowerings, so the same blob serves the TPU
    fleet and runs in CPU CI.

    ``tensor_parallel > 1`` exports a SHARDED trajectory: params carry the
    Megatron split (`dist/sharding.param_shardings`) over a (dp=1, tp=N)
    mesh, z/y/rng replicate, and the exported StableHLO embeds the
    per-block psums. The artifact then requires exactly N devices at call
    time (`jax.export` pins nr_devices); :func:`load_sampler` re-creates
    the mesh and places the weights per this convention. Matches the live
    `sample.py tensor_parallel: N` serving semantics, latents-parity
    tested against it.

    Returns (Exported, header_dict).
    """
    extras = int(getattr(config, "extras", 1))
    frames = int(getattr(config, "num_frames", 16))
    # latent_size overrides image_size//8, mirroring sample.py main
    latent = int(
        getattr(config, "latent_size", 0)
        or int(getattr(config, "image_size", 256)) // 8
    )
    in_ch = int(getattr(config, "in_channels", 4))

    if block_cache is not None:
        # block-cache trajectory (core/block_cache.py): the artifact bakes
        # the cond-staged scan; semantics match the live cached sampler.
        # Composes with tensor_parallel — the tp branch below shards the
        # same param tree and the cond-staged forward partitions like the
        # standard one (parity: tests/test_aot_serve.py).
        from latte_tpu.core.block_cache import cached_sample_loop

        bc_k, bc_n = int(block_cache[0]), int(block_cache[1])
        use_cfg = extras == 2 and float(getattr(config, "cfg_scale", 1.0)) > 1.0

        def sample_impl(p, z, y, rng):
            return cached_sample_loop(
                diffusion, model, p, z,
                cache_pairs=bc_k, cache_interval=bc_n, y=y,
                cfg_scale=float(getattr(config, "cfg_scale", 1.0)),
                sample_method=str(getattr(config, "sample_method", "ddpm")).lower(),
                rng=rng,
            )
    else:
        sample_impl, use_cfg = _build_sample_impl(model, config, diffusion)

    z_shape = (batch, frames, in_ch, latent, latent)
    tp = int(tensor_parallel or 1)
    if tp > 1:
        if getattr(model, "fused_adaln", False):
            raise ValueError(
                "fused_adaln does not compose with tensor_parallel export "
                "(the Pallas adaLN kernels are opaque to the SPMD partitioner)"
            )
        from latte_tpu.dist.mesh import MeshConfig, make_mesh
        from latte_tpu.dist.sharding import param_shardings

        if len(jax.devices()) < tp:
            raise ValueError(
                f"tensor_parallel={tp} export needs {tp} devices to trace "
                f"the sharded program, have {len(jax.devices())}"
            )
        mesh = make_mesh(MeshConfig(dp=1, tp=tp), devices=jax.devices()[:tp])
        p_shard = param_shardings(params, mesh)
        rep = NamedSharding(mesh, P())
        p_spec = jax.tree_util.tree_map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            params,
            p_shard,
        )
        z_spec = jax.ShapeDtypeStruct(z_shape, jnp.float32, sharding=rep)
        y_spec = (
            jax.ShapeDtypeStruct((batch,), jnp.int32, sharding=rep)
            if extras == 2
            else None
        )
        rng_spec = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
        jit_kw = {"out_shardings": rep}
    else:
        z_spec = jax.ShapeDtypeStruct(z_shape, jnp.float32)
        y_spec = jax.ShapeDtypeStruct((batch,), jnp.int32) if extras == 2 else None
        rng_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
        p_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
        )
        jit_kw = {}

    if y_spec is None:
        fn = lambda p, z, rng: sample_impl(p, z, None, rng)
        args = (p_spec, z_spec, rng_spec)
    else:
        fn = sample_impl
        args = (p_spec, z_spec, y_spec, rng_spec)

    exported = jax_export.export(
        jax.jit(fn, **jit_kw), platforms=tuple(platforms or ("tpu", "cpu"))
    )(*args)

    header = {
        "model": str(getattr(config, "model", model.__class__.__name__)),
        "sample_method": str(getattr(config, "sample_method", "ddpm")),
        "num_sampling_steps": int(getattr(config, "num_sampling_steps", 250)),
        "cfg": bool(use_cfg),
        "extras": extras,
        "batch": batch,
        "z_shape": list(z_shape),
        "takes_y": y_spec is not None,
        "platforms": list(exported.platforms),
        "tensor_parallel": tp,
        "block_cache": list(block_cache) if block_cache is not None else None,
    }
    return exported, header


def save_sampler(path: str, exported: jax_export.Exported, header: dict) -> str:
    """Write the artifact: magic | u32 header_len | JSON header | blob."""
    hdr = json.dumps(header, sort_keys=True).encode("utf-8")
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(blob)
    return path


def load_sampler(path: str):
    """Read an artifact; returns (call_fn, header).

    ``call_fn(params, z[, y], rng)`` executes the exported trajectory on
    the ambient backend (must be one of the artifact's platforms). For a
    ``tensor_parallel > 1`` artifact the loader re-creates the mesh the
    artifact was exported under (first N ambient devices, dp=1 × tp=N) and
    places the arguments per the artifact's convention — host-resident
    params arrive Megatron-split, z/y/rng replicated — before calling.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a latte-tpu AOT artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode("utf-8"))
        exported = jax_export.deserialize(f.read())

    tp = int(header.get("tensor_parallel", 1) or 1)
    if tp > 1:
        from latte_tpu.dist.mesh import MeshConfig, make_mesh
        from latte_tpu.dist.sharding import param_shardings

        if len(jax.devices()) < tp:
            raise ValueError(
                f"artifact was exported tensor_parallel={tp}; "
                f"{len(jax.devices())} devices available"
            )
        mesh = make_mesh(MeshConfig(dp=1, tp=tp), devices=jax.devices()[:tp])
        rep = NamedSharding(mesh, P())

        def call(params, *rest):
            p_shard = param_shardings(params, mesh)
            params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
            rest = tuple(jax.device_put(a, rep) for a in rest)
            return exported.call(params, *rest)

        call.tp_mesh = mesh
        return call, header

    def call(params, *rest):
        return exported.call(params, *rest)

    return call, header
