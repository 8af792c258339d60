"""Training entry point.

Capability parity with `/root/reference/train.py:47-285` (and the joint
variant `train_with_img.py`), TPU-native: one jitted+donated train step
fuses VAE encode, q_sample, the DiT forward/backward, AdamW, deferred grad
clipping and EMA; the batch is sharded over the mesh ``dp`` axis and XLA
inserts the gradient all-reduce over ICI (replacing DDP/NCCL).

Usage: ``python -m latte_tpu.train.train --config configs/ffs/ffs_train.yaml``
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
from latte_tpu.config.loader import save_config
from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.dist.mesh import MeshConfig, make_mesh, replicate, shard_batch
from latte_tpu.models import get_models
from latte_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    wait_for_saves,
)
from latte_tpu.train.state import (
    create_train_state,
    make_optimizer,
    trainable_temporal_attn_mask,
)
from latte_tpu.train.step import make_train_step
from latte_tpu.utils import create_experiment_dir, create_logger


def build_encode_fn(config):
    """Optional fused VAE encoder: returns (encode_fn, frozen_vae_params)
    or None. encode_fn(video, rng, params) -> scaled latents.

    ``vae_ckpt: random`` initializes the SD VAE encoder with random
    (seeded) weights — a smoke/e2e path exercising the full fused
    pixel->latent->DiT program without converted HF weights."""
    vae_ckpt = getattr(config, "vae_ckpt", None)
    if not vae_ckpt:
        return None

    from latte_tpu.vae import AutoencoderKL

    vae = AutoencoderKL()
    if str(vae_ckpt) == "random":
        sample = jnp.zeros((1, 3, int(config.image_size), int(config.image_size)))
        vae_params = jax.jit(
            lambda: vae.init({"params": jax.random.PRNGKey(0)}, sample)
        )()
    elif os.path.exists(str(vae_ckpt)):
        import orbax.checkpoint as ocp

        vae_params = {
            "params": ocp.PyTreeCheckpointer().restore(os.path.abspath(vae_ckpt))
        }
    else:
        raise FileNotFoundError(
            f"vae_ckpt {vae_ckpt!r} does not exist — convert the SD VAE with "
            "tools/convert_vae.py, or use vae_ckpt: random for a smoke run"
        )
    scale = float(getattr(config, "vae_scale", 0.18215))

    def encode(video, rng, params):
        B, F = video.shape[:2]
        flat = video.reshape(B * F, *video.shape[2:])
        post = vae.apply(params, flat, method=vae.encode)
        z = post.sample(rng) * scale
        return z.reshape(B, F, *z.shape[1:])

    encode.raw = lambda flat, params: vae.apply(params, flat, method=vae.encode)
    return encode, vae_params


def build_encode_fn_raw(config):
    """The same frozen VAE as :func:`build_encode_fn`, exposed as a raw
    posterior encoder ``(flat_pixels, params) -> DiagonalGaussian`` — used
    by `tools/cache_latents.py` to store posterior moments offline."""
    built = build_encode_fn(config)
    if built is None:
        raise ValueError("latent caching needs vae_ckpt set in the config")
    encode, vae_params = built
    return encode.raw, vae_params


def make_batch_iterator(config, logger, global_batch: int):
    """Real dataset when data_path exists, else a synthetic latent stream
    (keeps the loop runnable for smoke tests and dry runs)."""
    data_path = str(getattr(config, "data_path", "") or "")
    latent = int(
        getattr(config, "latent_size", 0) or int(config.image_size) // 8
    )
    frames = int(getattr(config, "num_frames", 16)) + int(
        getattr(config, "use_image_num", 0) or 0
    )
    from latte_tpu.data.latents import LatentCacheDataset, is_latent_cache

    if is_latent_cache(data_path):
        # offline-encoded posterior moments (tools/cache_latents.py): the
        # per-step VAE encode disappears; the step samples from the cached
        # moments (train/step.py "latent_mean" branch)
        from latte_tpu.data import DataLoader

        dataset = LatentCacheDataset(data_path)
        logger.info(
            f"latent cache {data_path}: {len(dataset)} items "
            f"({dataset.meta['frames']}f, latent {dataset.meta['latent_shape']})"
        )
        cache_scale = float(dataset.meta.get("vae_scale", 0.18215))
        cfg_scale_ = float(getattr(config, "vae_scale", cache_scale))
        if abs(cache_scale - cfg_scale_) > 1e-9:
            logger.warning(
                f"latent cache was encoded with vae_scale={cache_scale} but "
                f"the config says {cfg_scale_}; using the CACHE's scale"
            )
        config.vae_scale = cache_scale
        loader = DataLoader(
            dataset,
            batch_size=global_batch,
            num_workers=int(getattr(config, "num_workers", 4) or 4),
            seed=int(getattr(config, "global_seed", 0)),
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
        )
        return iter(loader), "latents_cached"
    if os.path.isdir(data_path):
        from latte_tpu.data import DataLoader, get_dataset

        dataset = get_dataset(config)
        logger.info(f"dataset {config.dataset}: {len(dataset)} videos")
        loader = DataLoader(
            dataset,
            batch_size=global_batch,
            num_workers=int(getattr(config, "num_workers", 4) or 4),
            seed=int(getattr(config, "global_seed", 0)),
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
            pixel_uint8=str(getattr(config, "pixel_transport", "uint8"))
            == "uint8",
        )
        return iter(loader), "real"
    rng = np.random.default_rng(int(getattr(config, "global_seed", 0)))
    if str(getattr(config, "synthetic_kind", "latents")) == "pixels":
        # pixel-control stream: identical compute AND transfer volume to the
        # real-data path (uint8 video through the fused VAE encode), minus
        # the host decode/transform — isolates input-pipeline overhead
        logger.info("data_path missing — using synthetic uint8 PIXEL batches")
        size = int(config.image_size)

        def synthetic_pixels():
            extras = int(getattr(config, "extras", 1))
            while True:
                batch = {
                    "video": rng.integers(
                        0, 256, size=(global_batch, frames, 3, size, size),
                        dtype=np.uint8,
                    )
                }
                if extras == 2:
                    nc = int(getattr(config, "num_classes", 1) or 1)
                    batch["y"] = rng.integers(0, nc, size=(global_batch,), dtype=np.int32)
                yield batch

        return synthetic_pixels(), "synthetic_pixels"
    logger.info("data_path missing — using synthetic latent batches")

    def synthetic():
        extras = int(getattr(config, "extras", 1))
        while True:
            batch = {
                "latents": rng.standard_normal(
                    (global_batch, frames, 4, latent, latent), dtype=np.float32
                )
            }
            if extras == 2:
                nc = int(getattr(config, "num_classes", 1) or 1)
                batch["y"] = rng.integers(0, nc, size=(global_batch,), dtype=np.int32)
                if getattr(config, "use_image_num", 0):
                    batch["y_image"] = rng.integers(
                        0, nc, size=(global_batch, int(config.use_image_num)), dtype=np.int32
                    )
            elif extras == 78:  # pooled-CLIP conditioning path
                batch["text_embedding"] = rng.standard_normal(
                    (global_batch, 77, 768), dtype=np.float32
                )
            yield batch

    return synthetic(), "synthetic_latents"


def main(config: Config, callbacks=None) -> dict:
    from latte_tpu.train.callbacks import CallbackList
    from latte_tpu.dist.mesh import barrier, initialize_distributed

    # persistent XLA compile cache (same knob as bench.py): XL-size init +
    # train-step compiles cost minutes through a remote relay on a cold
    # start, seconds when replayed from the cache. JAX_CACHE_DIR="" opts
    # out entirely (the test suite does: the cache's zstd codec has
    # segfaulted under pytest's many small CPU executables).
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/latte_tpu_jax_cache")
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass

    # multi-host rendezvous BEFORE any backend use (no-op single-process;
    # replaces the reference's setup_distributed NCCL/SLURM init)
    initialize_distributed(
        coordinator_address=getattr(config, "coordinator_address", None),
        num_processes=getattr(config, "num_processes", None),
        process_id=getattr(config, "process_id", None),
    )

    cbs = CallbackList(callbacks)
    results_dir = str(getattr(config, "results_dir", "./results"))
    if jax.process_index() == 0:
        experiment_dir = create_experiment_dir(results_dir, config)
    barrier("experiment_dir")
    if jax.process_index() != 0:
        # join the dir process 0 just created: restrict to the auto-index
        # pattern NNN-<name> and pick the highest parsed index (a stray
        # file that merely sorts last must not hijack the join, and the
        # numeric parse survives >999 runs overflowing the zero padding)
        exps = [
            d
            for d in os.listdir(results_dir)
            if "-" in d and d.split("-")[0].isdigit()
        ]
        assert exps, f"no experiment dirs found under {results_dir}"
        latest = max(exps, key=lambda d: int(d.split("-")[0]))
        experiment_dir = os.path.join(results_dir, latest)
    logger = create_logger(experiment_dir)
    save_config(config, os.path.join(experiment_dir, "config.yaml"))
    ckpt_dir = os.path.join(experiment_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        if jax.process_index() == 0:
            writer = SummaryWriter(os.path.join(experiment_dir, "tb"))
    except Exception:
        pass

    model = get_models(config)
    if getattr(config, "mixed_precision", False):
        model = model.clone(dtype=jnp.bfloat16)
    if getattr(config, "quant_train", False):
        # int8 quantized training (QAT): W8A8 forward on the hot block
        # matmuls, straight-through backward onto fp32 masters — the model
        # trains against the exact arithmetic of `quantized: true` serving
        model = model.clone(quantized="train")
    diffusion = create_diffusion("", diffusion_steps=1000)
    fixed_spatial = bool(getattr(config, "fixed_spatial", False))
    optimizer = make_optimizer(
        lr=float(getattr(config, "learning_rate", 1e-4)),
        weight_decay=float(getattr(config, "weight_decay", 0.0)),
        warmup_steps=int(getattr(config, "lr_warmup_steps", 0) or 0),
        # reference get_lr_scheduler 'warmup' | 'cosine'
        # (`/root/reference/models/__init__.py:21-28`)
        schedule=str(getattr(config, "lr_schedule", "warmup")),
        decay_steps=int(
            getattr(config, "lr_decay_steps", 0)
            or getattr(config, "max_train_steps", 0)
            or 0
        ),
        lr_min=float(getattr(config, "lr_min", 0.0) or 0.0),
        # frozen leaves must not weight-decay: mask decay to the
        # trainable (temporal attn) subset when fixed_spatial
        decay_mask=(
            trainable_temporal_attn_mask if fixed_spatial else None
        ),
        # bf16 first-moment storage: cuts Adam-state HBM traffic (the
        # single-chip step's 31% bandwidth floor, docs/tpu_notes.md
        # "training roofline"); nu/EMA stay fp32 (their per-step
        # increments are below bf16 resolution)
        mu_dtype=(
            jnp.bfloat16
            if str(getattr(config, "adam_mu_dtype", "") or "") == "bfloat16"
            else None
        ),
    )

    n_dev = jax.device_count()
    tp = int(getattr(config, "tensor_parallel", 1) or 1)
    sp = int(getattr(config, "sequence_parallel", 1) or 1)
    pp = int(getattr(config, "pipeline_parallel", 1) or 1)
    ep = int(getattr(config, "expert_parallel", 1) or 1)
    assert n_dev % (tp * sp * pp * ep) == 0, (
        f"tensor_parallel={tp} x sequence_parallel={sp} x "
        f"pipeline_parallel={pp} x expert_parallel={ep} must divide "
        f"{n_dev} devices"
    )
    moe_experts = int(getattr(config, "moe_experts", 0) or 0)
    if ep > 1:
        if moe_experts % ep != 0 or moe_experts < ep:
            raise ValueError(
                f"expert_parallel={ep} needs moe_experts (got {moe_experts}) "
                f"divisible by it"
            )
        if pp > 1:
            raise ValueError(
                "expert_parallel does not compose with pipeline_parallel "
                "(the pipelined stage shards the pair stack wholesale)"
            )
    if pp > 1:
        # the pipelined forward shards the pair stack by depth; it covers
        # the Latte/LatteIMG conditioning path and replaces the width/token
        # sharding strategies rather than composing with them
        if tp > 1 or sp > 1:
            raise ValueError(
                "pipeline_parallel composes with data parallelism only "
                f"(got tensor_parallel={tp}, sequence_parallel={sp})"
            )
        if bool(getattr(config, "fsdp", False)):
            raise ValueError(
                "pipeline_parallel already shards the block stack; "
                "disable fsdp (zero1 moment sharding is compatible)"
            )
    dp = n_dev // (tp * sp * pp * ep)
    mesh = make_mesh(MeshConfig(dp=dp, tp=tp, sp=sp, pp=pp, ep=ep))
    if getattr(model, "fused_adaln", False) and n_dev > 1:
        # A pallas_call is opaque to GSPMD: under any sharded mesh (dp/
        # FSDP included) the partitioner would all-gather its operands to
        # full replication — a silent perf cliff and a possible multi-host
        # OOM. Drop the kernel rather than serve the cliff.
        logger.warning(
            "fused_adaln disabled: the Pallas adaLN kernels do not compose "
            "with a %d-device mesh (pallas_call is opaque to the SPMD "
            "partitioner); using the XLA-fused path",
            n_dev,
        )
        model = model.clone(fused_adaln=False)
    local_batch = int(getattr(config, "local_batch_size", 5))
    global_batch = local_batch * dp
    if (
        getattr(config, "unroll_blocks", None) is None
        and jax.default_backend() == "tpu"
        and n_dev == 1
        and local_batch == 1
        and not bool(getattr(config, "fsdp", False))
    ):
        # Unroll the scanned pair stack for unsharded single-chip training
        # at per-step batch 1: lax.scan over stacked weights issues ~1.8k
        # small async weight-slice copies per step that stall the MXU
        # (measured 170.1 -> 134.4 ms/step at XL/2 B=1, docs/tpu_notes.md
        # "training roofline"). Pure execution hint — params/checkpoints/
        # shardings identical. Gated to batch 1 because unrolling raises
        # peak HBM (XL B=2 unrolled OOMs at 19.05G where the scan fits and
        # runs 330 ms/step); sharded meshes keep the scan (program size
        # and compile time grow with the mesh; not measured there).
        model = model.clone(unroll_blocks=True)

    extras = int(getattr(config, "extras", 1))
    frames = int(getattr(config, "num_frames", 16))
    use_image_num = int(getattr(config, "use_image_num", 0) or 0)
    latent = int(
        getattr(config, "latent_size", 0) or int(config.image_size) // 8
    )

    # init params (jitted — eager dispatch is slow on remote TPU backends)
    x0 = jnp.zeros((1, frames + use_image_num, 4, latent, latent))
    init_rngs = {"params": jax.random.PRNGKey(0)}
    kw = {}
    if extras == 2:
        init_rngs["label_dropout"] = jax.random.PRNGKey(1)
        kw["y"] = jnp.zeros((1,), jnp.int32)
        if use_image_num:
            kw["y_image"] = jnp.zeros((1, use_image_num), jnp.int32)
            kw["train"] = True
    def init_params():
        return model.init(init_rngs, x0, jnp.zeros((1,), jnp.int32), **kw)["params"]

    # ---- shardings from SHAPE METADATA before anything materializes: a
    # fresh FSDP/TP start must never hold the full fp32 state (params +
    # EMA + Adam moments, ~4x params) unsharded on one device
    state_shapes = jax.eval_shape(lambda: create_train_state(init_params(), optimizer))

    zero1 = bool(getattr(config, "zero1", False))
    fsdp = bool(getattr(config, "fsdp", False))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from latte_tpu.dist.sharding import (
        ep_param_shardings,
        fsdp_opt_shardings,
        fsdp_param_shardings,
        param_shardings,
        pp_param_shardings,
        zero1_opt_shardings,
    )
    from latte_tpu.train.state import TrainState

    rep = NamedSharding(mesh, P())
    if fsdp:
        # with ep > 1 the FSDP rule pins MoE expert axes to "ep" first
        p_shard = fsdp_param_shardings(state_shapes.params, mesh)
    elif pp > 1:
        p_shard = pp_param_shardings(state_shapes.params, mesh)
    elif ep > 1:
        # expert weights over ep; non-MoE leaves take the TP rules
        p_shard = ep_param_shardings(state_shapes.params, mesh)
    elif tp > 1:
        p_shard = param_shardings(state_shapes.params, mesh)
    else:
        p_shard = jax.tree_util.tree_map(lambda _: rep, state_shapes.params)
    if fsdp:
        opt_shard = fsdp_opt_shardings(state_shapes.opt_state, mesh)
    elif pp > 1:
        # moments mirror the depth sharding; zero1 dp-splits the remainder
        opt_shard = pp_param_shardings(state_shapes.opt_state, mesh, zero1=zero1)
    elif ep > 1:
        if zero1:
            raise ValueError(
                "zero1 + expert_parallel: use fsdp instead (its rule "
                "composes the ep and dp splits without moment resharding)"
            )
        # moments mirror the expert sharding — no resharding per step
        opt_shard = ep_param_shardings(state_shapes.opt_state, mesh)
    elif zero1:
        opt_shard = zero1_opt_shardings(state_shapes.opt_state, mesh)
    elif tp > 1:
        # moments mirror the Megatron splits — replicated moments would
        # cost 2x full-model fp32 per chip and reshard every step
        opt_shard = param_shardings(state_shapes.opt_state, mesh)
    else:
        opt_shard = jax.tree_util.tree_map(lambda _: rep, state_shapes.opt_state)
    state_sh = TrainState(
        step=rep, params=p_shard, ema_params=p_shard, opt_state=opt_shard
    )

    # optional partial pretrained load (reference `train.py:97-115`):
    # init runs SHARDED, loaded leaves overwrite matching-shape init leaves
    pretrained = getattr(config, "pretrained", None)
    state = None
    if pretrained and os.path.exists(str(pretrained)):
        from latte_tpu.train.checkpoint import find_model

        loaded = find_model(str(pretrained), depth=model.depth, num_heads=model.num_heads)
        params = jax.jit(init_params, out_shardings=p_shard)()
        flat_init = jax.tree_util.tree_leaves_with_path(params)
        loaded_flat = dict(jax.tree_util.tree_leaves_with_path(loaded))
        merged, skipped = [], 0
        for path, leaf in flat_init:
            cand = loaded_flat.get(path)
            if cand is not None and np.shape(cand) == np.shape(leaf):
                merged.append((path, jnp.asarray(cand)))
            else:
                merged.append((path, leaf))
                skipped += 1
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params), [v for _, v in merged]
        )
        logger.info(f"partial-loaded pretrained {pretrained} ({skipped} keys kept at init)")
        state = jax.jit(
            lambda p: create_train_state(p, optimizer), out_shardings=state_sh
        )(params)
        params = None

    # resume
    resume = getattr(config, "resume_from_checkpoint", None)
    start_step = 0
    if resume:
        if os.path.isdir(str(resume)):
            path = str(resume)
        else:
            # `true` without a path: this run's fresh experiment dir has no
            # checkpoints yet — scan sibling experiment dirs in results_dir
            from latte_tpu.train.checkpoint import latest_checkpoint_under

            path = latest_checkpoint(ckpt_dir) or latest_checkpoint_under(
                str(getattr(config, "results_dir", "./results")),
                model=str(getattr(config, "model", "") or "") or None,
            )
            if path is None:
                logger.warning(
                    "resume_from_checkpoint set but no checkpoint found "
                    f"under {getattr(config, 'results_dir', './results')!r}; "
                    "starting from scratch"
                )
        if path:
            # restore into the state STRUCTURE so optax NamedTuple states
            # come back typed, not as raw dicts — the target is built from
            # shape metadata only (no init state is ever materialized,
            # so nothing competes with the restored upload for HBM)
            host_zeros = lambda tree: jax.tree_util.tree_map(
                lambda a: np.zeros(a.shape, np.dtype(a.dtype)), tree
            )
            target = {
                "step": np.zeros((), np.int32),
                "params": host_zeros(state_shapes.params),
                "ema_params": host_zeros(state_shapes.ema_params),
                "opt_state": host_zeros(state_shapes.opt_state),
            }
            payload = load_checkpoint(path, target=target)
            state = TrainState(
                step=jnp.asarray(payload["step"], jnp.int32),
                params=payload["params"],
                ema_params=payload["ema_params"],
                opt_state=payload["opt_state"],
            )
            del payload
            start_step = int(state.step)
            logger.info(f"resumed from {path} @ step {start_step}")

    if state is None:
        # fresh start: the whole state is born sharded
        state = jax.jit(
            lambda: create_train_state(init_params(), optimizer),
            out_shardings=state_sh,
        )()

    # each process loads only its rows; shard_batch assembles the global
    # array from per-process shards on multi-host setups
    host_batch = global_batch // jax.process_count()
    batches, data_kind = make_batch_iterator(config, logger, host_batch)
    needs_encode = data_kind in ("real", "synthetic_pixels")
    built = build_encode_fn(config) if needs_encode else None
    if not needs_encode and getattr(config, "vae_ckpt", None):
        # synthetic-latent batches ARE latents — fusing a VAE encode would
        # make the step read batch["video"], which that stream never
        # produces (it would KeyError at the first jitted step)
        logger.info("synthetic batches: VAE encode skipped (latents direct)")
    encode_fn, encode_params = built if built is not None else (None, None)
    if sp > 1:
        # sequence-parallel activations; model.init above ran without the
        # sharding constraints (with_sharding_constraint needs a mesh context)
        model = model.clone(activation_sharding=("dp", "sp"))
    if ep > 1:
        # pin the expert-major intermediates to the ep axis inside the
        # jitted step (init above ran constraint-free, same as sp)
        model = model.clone(moe_ep_axis="ep")
    grad_accum = int(getattr(config, "gradient_accumulation_steps", 1) or 1)
    if grad_accum > 1:
        # per-chunk batches must still split evenly over dp
        assert local_batch % grad_accum == 0, (
            f"gradient_accumulation_steps={grad_accum} must divide "
            f"local_batch_size={local_batch}"
        )
        logger.info(f"gradient accumulation: {grad_accum} chunks/step")
    apply_fn = None
    if pp > 1:
        from latte_tpu.dist.pipeline import make_pipelined_apply

        # microbatches split the GLOBAL batch each forward sees (a
        # grad-accum chunk when gradient_accumulation_steps > 1) into the
        # units streaming through the stages; bubble fraction (S-1)/(M+S-1)
        pp_microbatches = int(getattr(config, "pp_microbatches", 0) or 0) or max(
            2, 2 * pp
        )
        fwd_batch = global_batch // grad_accum
        assert fwd_batch % pp_microbatches == 0, (
            f"per-forward batch {fwd_batch} (global {global_batch} / "
            f"grad_accum {grad_accum}) not divisible by "
            f"pp_microbatches={pp_microbatches}"
        )
        apply_fn = make_pipelined_apply(model, mesh, microbatches=pp_microbatches)
        logger.info(
            f"pipeline parallelism: pp={pp} stages x {pp_microbatches} microbatches"
        )
    moe_aux_weight = (
        float(getattr(config, "moe_aux_weight", 0.01) or 0.0)
        if moe_experts > 1
        else 0.0
    )
    if moe_aux_weight > 0.0 and pp > 1:
        # the pipelined forward can't carry the sown per-pair aux losses
        # across stage hops — routers train without a balancing signal
        logger.warning(
            "pipeline_parallel > 1 discards moe_aux_weight="
            f"{moe_aux_weight}: the MoE load-balancing loss is not "
            "collectable through the pipelined forward; routing balance "
            "is unregularized on this run"
        )
        moe_aux_weight = 0.0
    train_step = make_train_step(
        model,
        diffusion,
        optimizer,
        ema_decay=float(getattr(config, "ema_decay", 0.9999)),
        # EMA refresh every K steps at decay^K (same time constant);
        # skips the 2×params EMA read+write on off-steps
        ema_every=int(getattr(config, "ema_every", 1) or 1),
        clip_max_norm=float(getattr(config, "clip_max_norm", 0.1)),
        start_clip_iter=int(getattr(config, "start_clip_iter", 0) or 0),
        extras=extras,
        encode_fn=encode_fn,
        fixed_spatial=fixed_spatial,
        apply_fn=apply_fn,
        grad_accum=grad_accum,
        # MoE load-balancing loss weight (Switch Transformer's 0.01
        # default); only collectable on the non-pipelined forward
        moe_aux_weight=moe_aux_weight,
        # scales the cached-moments latents (latent-cache path); the cache
        # branch of make_batch_iterator pins it to the cache's own scale
        vae_scale=float(getattr(config, "vae_scale", 0.18215)),
    )
    jitted_step = jax.jit(train_step, donate_argnums=(0,))
    if encode_params is not None:
        encode_params = jax.tree_util.tree_map(jnp.asarray, encode_params)

    # schedule_sampler: "uniform" (default) or "loss-second-moment"
    # (reference `/root/reference/diffusion/timestep_sampler.py:13-150`).
    # Loss-aware mode samples t host-side from the evolving weights, feeds
    # it through the batch, and syncs the per-step (t, loss) history across
    # processes after each step.
    from latte_tpu.core.timestep_samplers import (
        LossAwareSampler,
        create_named_schedule_sampler,
    )

    schedule_sampler = create_named_schedule_sampler(
        str(getattr(config, "schedule_sampler", "uniform") or "uniform"), diffusion
    )
    loss_aware = isinstance(schedule_sampler, LossAwareSampler)

    if encode_fn is None and needs_encode:
        raise ValueError(
            "dataset videos are raw pixels but no VAE is configured: set "
            "vae_ckpt to converted SD-VAE params (tools/convert_vae.py), or "
            "vae_ckpt: random for a smoke run (reference always encodes "
            "through the frozen VAE, train.py:206-211)"
        )

    max_steps = int(getattr(config, "max_train_steps", 1000))
    log_every = int(getattr(config, "log_every", 100))
    ckpt_every = int(getattr(config, "ckpt_every", 10000))
    async_ckpt = bool(getattr(config, "async_checkpoint", True))
    rng = jax.random.PRNGKey(int(getattr(config, "global_seed", 0)))

    with mesh:
        # host-resident leaves (resume / pretrained merge) get placed per
        # the precomputed shardings; already-sharded leaves are no-ops
        state = jax.tree_util.tree_map(jax.device_put, state, state_sh)
        if tp > 1 or zero1 or sp > 1 or fsdp or pp > 1:
            # pin shardings through the step so ZeRO-1 moments stay
            # dp-split, TP weights stay column/row-split, and the pp pair
            # stack stays depth-split across steps
            jitted_step = jax.jit(
                train_step,
                in_shardings=(state_sh, NamedSharding(mesh, P("dp")), None, None)
                if encode_params is None
                else (state_sh, NamedSharding(mesh, P("dp")), None, rep),
                out_shardings=(state_sh, None),
                donate_argnums=(0,),
            )
        cbs.on_train_start(config, state, experiment_dir)
        running, t_start = [], time.perf_counter()
        last_metrics = {}
        stop_step = max_steps
        last_ckpt_step = None
        for step_idx in range(start_step, max_steps):
            host = next(batches)
            if loss_aware:
                # every process draws the SAME global t vector (shared seed
                # + identical synced weights), then contributes its rows
                rng_t = jax.random.fold_in(
                    jax.random.PRNGKey(int(getattr(config, "global_seed", 0)) ^ 0x5EED),
                    step_idx,
                )
                t_all, w_all = schedule_sampler.sample(rng_t, global_batch)
                lo = jax.process_index() * host_batch
                host["t"] = np.asarray(t_all)[lo : lo + host_batch]
                host["t_weights"] = np.asarray(w_all)[lo : lo + host_batch]
            batch = shard_batch(mesh, host)
            state, metrics = jitted_step(state, batch, rng, encode_params)
            if loss_aware:
                schedule_sampler.update_with_local_losses(
                    metrics["t_sampled"], metrics["per_sample_loss"]
                )
            running.append(metrics)
            if (step_idx + 1) % log_every == 0:
                # one host sync per log interval
                loss = float(jax.device_get(metrics["loss"]))
                gnorm = float(jax.device_get(metrics["grad_norm"]))
                steps_per_sec = len(running) / (time.perf_counter() - t_start)
                logger.info(
                    f"step {step_idx + 1}: loss={loss:.4f} grad_norm={gnorm:.3f} "
                    f"steps/s={steps_per_sec:.2f}"
                )
                if writer is not None:
                    writer.add_scalar("train/loss", loss, step_idx + 1)
                    writer.add_scalar("train/grad_norm", gnorm, step_idx + 1)
                    writer.add_scalar("train/steps_per_sec", steps_per_sec, step_idx + 1)
                last_metrics = {"loss": loss, "grad_norm": gnorm, "steps_per_sec": steps_per_sec}
                cbs.on_log(step_idx + 1, last_metrics)
                if cbs.should_stop(step_idx + 1, last_metrics):
                    logger.info(f"early stop requested at step {step_idx + 1}")
                    stop_step = step_idx + 1
                    break
                running, t_start = [], time.perf_counter()
            if (step_idx + 1) % ckpt_every == 0:
                # EVERY process participates: orbax writes of cross-host
                # sharded arrays (fsdp/zero1/tp) are collective. Async by
                # default: snapshot-to-host blocks, serialization and the
                # disk write overlap with subsequent train steps.
                path = os.path.join(ckpt_dir, f"{step_idx + 1:07d}")
                save_checkpoint(path, state, block=not async_ckpt)
                last_ckpt_step = step_idx + 1
                if jax.process_index() == 0:
                    logger.info(
                        f"saved checkpoint {path}"
                        + (" (async)" if async_ckpt else "")
                    )
                cbs.on_checkpoint(step_idx + 1, path)

    # drain in-flight async writes BEFORE the final save: a sync save to
    # the same step path would race the async writer's tmp dir
    wait_for_saves()
    final_path = os.path.join(ckpt_dir, f"{stop_step:07d}")
    # skip when that step was already saved, or when nothing trained
    # (resume step >= max_steps: a save here would mislabel the restored
    # higher step as stop_step)
    if last_ckpt_step != stop_step and stop_step > start_step:
        save_checkpoint(final_path, state)
        cbs.on_checkpoint(stop_step, final_path)
    barrier("final_checkpoint")
    if writer is not None:
        writer.close()
    result = {"experiment_dir": experiment_dir, "final_step": stop_step, **last_metrics}
    cbs.on_train_end(result)
    return result


def cli():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("overrides", nargs="*")
    a = p.parse_args()
    main(load_config(a.config, a.overrides))


if __name__ == "__main__":
    cli()
