"""Single-device sampling entry point.

Reproduces `bash sample/ffs.sh` semantics
(`/root/reference/sample/sample.py:39-126`): build model from config, load
checkpoint (EMA preferred), respaced DDPM/DDIM loop with optional CFG, VAE
decode (/0.18215), mp4 out at fps 8 — with the whole denoising trajectory
jitted as one `lax.scan` program.

Usage: ``python -m latte_tpu.sample.sample --config configs/ffs/ffs_sample.yaml
[key=value ...]``
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.config import Config, load_config
from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.core.samplers import ddim_sample_loop, p_sample_loop
from latte_tpu.models import get_models
from latte_tpu.train.checkpoint import find_model
from latte_tpu.utils import create_logger, save_video, to_uint8


def build_sample_impl(model, config, diffusion, loop: str = "scan"):
    """(params, z, y, rng) -> final-latents sampler body + its CFG flag.

    The single source of the sampler construction (CFG predicate,
    forward_with_cfg wrapper, ddpm/ddim loop select) — shared by the
    live jitted path below and the AOT export (`latte_tpu/serve/aot.py`),
    which must stay program-identical to it.
    """
    use_cfg = (
        int(getattr(config, "extras", 1)) == 2
        and float(getattr(config, "cfg_scale", 1.0)) > 1.0
    )
    sample_method = str(getattr(config, "sample_method", "ddpm")).lower()

    def model_apply(p, x, t, **kw):
        if use_cfg:
            return model.apply(
                p, x, t, cfg_scale=float(config.cfg_scale),
                method=model.forward_with_cfg, **kw,
            )
        return model.apply(p, x, t, **kw)

    def sample_impl(p, z, y, rng):
        kwargs = {"y": y} if y is not None else {}
        loop_fn = ddim_sample_loop if sample_method == "ddim" else p_sample_loop
        return loop_fn(
            diffusion,
            None,
            z,
            rng=rng,
            model_kwargs=kwargs,
            loop=loop,
            params=p,
            model_apply=model_apply,
        )

    return sample_impl, use_cfg


def build_sample_fn(model, params, config, diffusion, allow_tp: bool = True):
    """Return a (z, y, rng) -> final-latents function.

    ``loop_mode``: "scan" (default) compiles the whole trajectory into one
    XLA program; "host" drives a Python loop over one jitted step —
    required on remote-relay TPU backends whose compiler cannot handle
    while-loops around the full model (docs/tpu_notes.md).

    ``allow_tp``: callers that manage their own mesh/shardings
    (sample_many's dp BatchGenerator) pass False so a train-derived
    config carrying ``tensor_parallel`` doesn't pin this sampler to a
    conflicting tp submesh.

    ``block_cache_interval: N`` (> 1) switches to the block-cache sampler
    (`latte_tpu/core/block_cache.py`): the first ``block_cache_pairs``
    (default 2/3 of the pair stack) recompute only every Nth step — a
    training-free Δ-DiT/BlockDance-style approximation, quality-guarded
    in bench.py. Composes with `quantized` AND with `tensor_parallel`
    serving (the cond-staged scan jits over the same Megatron-split
    params as the standard tp sampler); Latte-family scan-mode only.
    """
    loop_mode = str(getattr(config, "loop_mode", "scan") or "scan")
    bc_interval = int(getattr(config, "block_cache_interval", 0) or 0)
    if bc_interval > 1:
        from latte_tpu.core.block_cache import cached_sample_loop

        if loop_mode != "scan":
            raise ValueError("block_cache_interval requires loop_mode=scan")
        n_pairs = model.depth // 2
        k = int(getattr(config, "block_cache_pairs", 0) or (n_pairs * 2) // 3)
        use_cfg = (
            int(getattr(config, "extras", 1)) == 2
            and float(getattr(config, "cfg_scale", 1.0)) > 1.0
        )

        def cached_impl(p, z, y, rng):
            return cached_sample_loop(
                diffusion, model, p, z,
                cache_pairs=k, cache_interval=bc_interval, y=y,
                cfg_scale=float(getattr(config, "cfg_scale", 1.0)),
                sample_method=str(getattr(config, "sample_method", "ddpm")).lower(),
                rng=rng,
            )

        # params stay a jit ARGUMENT (closing over device arrays bakes the
        # weight tree into the HLO — same rule as the paths below)
        tp = int(getattr(config, "tensor_parallel", 1) or 1) if allow_tp else 1
        if tp > 1:
            # block-cache × tensor parallelism: the cond-staged forward
            # partitions like the standard one (both cond branches apply
            # the Megatron-split params; the front activation and the
            # sliced-back param view replicate/split exactly as in the
            # full forward), so the same mesh + sharding recipe as the
            # tp branch below applies. Latents-parity vs the
            # single-device cached sampler: tests/test_sample_tp.py.
            if getattr(model, "fused_adaln", False):
                raise ValueError(
                    "fused_adaln does not compose with tensor_parallel "
                    "serving (the Pallas adaLN kernels are opaque to the "
                    "SPMD partitioner); disable one of the two"
                )
            from jax.sharding import NamedSharding, PartitionSpec as P

            from latte_tpu.dist.mesh import MeshConfig, make_mesh
            from latte_tpu.dist.sharding import param_shardings

            n_dev = len(jax.devices())
            if n_dev < tp:
                raise ValueError(
                    f"tensor_parallel={tp} needs {tp} devices, have {n_dev}"
                )
            mesh = make_mesh(MeshConfig(dp=1, tp=tp), devices=jax.devices()[:tp])
            p_shard = param_shardings(params, mesh)
            params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
            rep = NamedSharding(mesh, P())
            jitted = jax.jit(cached_impl, in_shardings=(p_shard, rep, rep, None))
            fn = lambda z, y, rng: jitted(params, z, y, rng)
            fn.tp_mesh, fn.tp_params = mesh, params
            return fn, use_cfg

        cached = jax.jit(cached_impl)
        return (lambda z, y, rng: cached(params, z, y, rng)), use_cfg
    sample_impl, use_cfg = build_sample_impl(
        model, config, diffusion, loop=loop_mode
    )

    # Params are an ARGUMENT of the jitted program in both modes — closing
    # over device arrays bakes them into the HLO. Host mode manages its own
    # per-step jit; jitting the outer fn would re-introduce the nested
    # while-loop.
    tp = int(getattr(config, "tensor_parallel", 1) or 1) if allow_tp else 1
    if tp > 1:
        # Tensor-parallel serving: Megatron param rules split attention
        # heads / MLP columns over the first `tp` chips and GSPMD inserts
        # the per-block psums — latency scaling for a single sample (the
        # throughput knob is sample_many's dp mesh). z/y replicate (the
        # serving batch is 1–2 with CFG).
        if loop_mode == "host":
            raise ValueError("tensor_parallel serving requires loop_mode=scan")
        if getattr(model, "fused_adaln", False):
            # pallas_call is opaque to GSPMD — under the tp mesh it would
            # force full activation replication around every block
            raise ValueError(
                "fused_adaln does not compose with tensor_parallel serving "
                "(the Pallas adaLN kernels are opaque to the SPMD "
                "partitioner); disable one of the two"
            )
        from jax.sharding import NamedSharding, PartitionSpec as P

        from latte_tpu.dist.mesh import MeshConfig, make_mesh
        from latte_tpu.dist.sharding import param_shardings

        n_dev = len(jax.devices())
        if n_dev < tp:
            raise ValueError(f"tensor_parallel={tp} needs {tp} devices, have {n_dev}")
        mesh = make_mesh(MeshConfig(dp=1, tp=tp), devices=jax.devices()[:tp])
        p_shard = param_shardings(params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
        rep = NamedSharding(mesh, P())
        jitted = jax.jit(sample_impl, in_shardings=(p_shard, rep, rep, None))
        fn = lambda z, y, rng: jitted(params, z, y, rng)
        # introspection hook (tests assert the split actually happened)
        fn.tp_mesh, fn.tp_params = mesh, params
    elif loop_mode == "host":
        fn = lambda z, y, rng: sample_impl(params, z, y, rng)
    else:
        jitted = jax.jit(sample_impl)
        fn = lambda z, y, rng: jitted(params, z, y, rng)
    return fn, use_cfg


def load_vae(config):
    """Load VAE decode params if configured.

    ``vae: tiny`` / ``vae_ckpt: random`` give seeded random-weight VAEs
    (tiny / full SD architecture) for smoke and e2e runs without converted
    HF weights."""
    if str(getattr(config, "vae", "") or "") == "tiny":
        from latte_tpu.vae.autoencoder_kl import tiny_vae

        vae = tiny_vae()
        params = jax.jit(
            lambda: vae.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3, 16, 16)))
        )()
        return vae, params
    vae_ckpt = getattr(config, "vae_ckpt", None)
    if not vae_ckpt:
        return None, None
    from latte_tpu.vae import AutoencoderKL

    vae = AutoencoderKL()
    if str(vae_ckpt) == "random":
        size = int(getattr(config, "image_size", 256))
        params = jax.jit(
            lambda: vae.init(
                {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3, size, size))
            )
        )()
        return vae, params
    if not os.path.exists(str(vae_ckpt)):
        return None, None
    import orbax.checkpoint as ocp

    params = ocp.PyTreeCheckpointer().restore(os.path.abspath(vae_ckpt))
    return vae, {"params": params}


def main(config: Config) -> str:
    logger = create_logger()
    # the reference's fp16 speedup toggle maps to bf16 on TPU
    dtype = jnp.bfloat16 if getattr(config, "use_fp16", False) else jnp.float32
    model = get_models(config)
    if dtype != jnp.float32:
        model = model.clone(dtype=dtype)

    latent = int(
        getattr(config, "latent_size", 0) or int(config.image_size) // 8
    )
    frames = int(getattr(config, "num_frames", 16))
    seed = int(getattr(config, "seed", 0))
    rng = jax.random.PRNGKey(seed)

    n = 1
    z = jax.random.normal(
        jax.random.fold_in(rng, 0), (n, frames, 4, latent, latent), dtype=jnp.float32
    )

    ckpt = getattr(config, "ckpt", None)
    if ckpt and os.path.exists(ckpt):
        # `prefer_ema: false` serves the raw optimizer params — needed when a
        # run is too short for the 0.9999-decay EMA to have converged (after
        # 2500 steps the EMA is still ~78% init); mirrors the reference's
        # "ema"-key preference in `utils.py:find_model` otherwise.
        params_tree = find_model(
            ckpt, depth=model.depth, num_heads=model.num_heads,
            prefer_ema=bool(getattr(config, "prefer_ema", True)),
        )
        params = {"params": jax.tree_util.tree_map(jnp.asarray, params_tree)}
        logger.info(f"loaded checkpoint {ckpt}")
    else:
        x0 = jnp.zeros((1, frames, 4, latent, latent))
        init_rngs = {"params": jax.random.PRNGKey(0)}
        kw = {}
        if int(getattr(config, "extras", 1)) == 2:
            init_rngs["label_dropout"] = jax.random.PRNGKey(1)
            kw["y"] = jnp.zeros((1,), jnp.int32)
        params = jax.jit(
            lambda: model.init(init_rngs, x0, jnp.zeros((1,), jnp.int32), **kw)
        )()
        logger.info("WARNING: no checkpoint found — sampling from random init")

    # W8A8 int8 serving: `quantized: true` quantizes the loaded fp params
    # once with DYNAMIC per-token activation scales; `quantized: static`
    # additionally runs a short calibration (three representative
    # timesteps over a seeded z) and folds the activation amax into
    # static per-tensor scales — the quantize then fuses into each
    # producer (measured 22.6 vs 23.8 ms/step at XL/2 DDIM-50,
    # docs/tpu_notes.md round 4).
    qmode = getattr(config, "quantized", False)
    if qmode:
        from latte_tpu.quant import quantize_params

        if str(qmode) == "static":
            import jax as _jax

            from latte_tpu.quant import merge_amax

            calib_m = model.clone(quantized="calib")
            extras_c = int(getattr(config, "extras", 1))
            zshape = (
                1,
                int(getattr(config, "num_frames", 16)),
                int(getattr(config, "in_channels", 4)),
                int(getattr(config, "latent_size", 0) or int(config.image_size) // 8),
            )
            zshape = zshape + (zshape[-1],)
            zc = _jax.random.normal(_jax.random.PRNGKey(0), zshape, jnp.float32)
            # conditioning inputs mirror the real forward (a conditional
            # model's calibration forward would crash without them)
            calib_kw = {}
            if extras_c == 2:
                calib_kw["y"] = jnp.full(
                    (1,), int(getattr(config, "sample_class", 0)), jnp.int32
                )
            elif extras_c == 78:
                calib_kw["text_embedding"] = jnp.zeros((1, 77, 768), jnp.float32)

            @_jax.jit
            def _amax(p, x, t_scalar):
                t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
                _, variables = calib_m.apply(
                    p, x, t, mutable=["calib"], **calib_kw
                )
                return variables["calib"]

            amax = None
            for tc in (999, 500, 0):
                amax = merge_amax(amax, _amax(params, zc, jnp.int32(tc)))
            model = model.clone(quantized="static")
            params = {"params": quantize_params(params["params"], act_amax=amax)}
            logger.info("serving with static-scale W8A8 int8 block matmuls")
        else:
            model = model.clone(quantized=True)
            params = {"params": quantize_params(params["params"])}
            logger.info("serving with W8A8 int8 block matmuls")

    diffusion = create_diffusion(str(config.num_sampling_steps))
    sample_fn, use_cfg = build_sample_fn(model, params, config, diffusion)

    y = None
    if int(getattr(config, "extras", 1)) == 2:
        y_val = getattr(config, "sample_class", 0)
        y = jnp.full((n,), int(y_val), jnp.int32)
        if use_cfg:
            # cond ∥ null-class halves (reference `sample/sample.py:88-94`)
            z = jnp.concatenate([z, z], axis=0)
            y = jnp.concatenate(
                [y, jnp.full((n,), model.num_classes, jnp.int32)], axis=0
            )

    t0 = time.perf_counter()
    latents = sample_fn(z, y, jax.random.fold_in(rng, 1))
    latents = jax.block_until_ready(latents)
    logger.info(f"sampled in {time.perf_counter() - t0:.2f}s")
    if use_cfg:
        latents = latents[:n]

    out_path = getattr(config, "save_video_path", "./sample_videos/sample.mp4")
    vae, vae_params = load_vae(config)
    if vae is not None:
        b, f = latents.shape[:2]
        from latte_tpu.vae import make_decode_fn

        flat = latents.reshape(b * f, *latents.shape[2:]) / 0.18215
        video = np.asarray(make_decode_fn(vae, vae_params)(flat))  # (b*f, 3, H, W)
        video = video.reshape(b, f, *video.shape[1:]).transpose(0, 1, 3, 4, 2)
        save_video(out_path, to_uint8(video[0]), fps=8)
        logger.info(f"saved video to {out_path}")
    else:
        out_path = os.path.splitext(out_path)[0] + "_latents.npz"
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.savez(out_path, latents=np.asarray(latents))
        logger.info(f"no VAE configured — saved latents to {out_path}")
    return out_path


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--save_video_path", default=None)
    p.add_argument("overrides", nargs="*")
    a = p.parse_args()
    cfg = load_config(a.config, a.overrides)
    if a.ckpt:
        cfg.ckpt = a.ckpt
    if a.save_video_path:
        cfg.save_video_path = a.save_video_path
    main(cfg)


if __name__ == "__main__":
    cli()
