"""Pipeline parallelism: the DiT block stack sharded by DEPTH over a mesh axis.

The reference scales only by data parallelism (DDP,
`/root/reference/train.py:125`); tp/sp/ZeRO in this repo shard width,
tokens, and state. Pipeline parallelism is the remaining axis: each device
along ``pp`` holds ``depth / pp`` of the (spatial, temporal) block pairs —
the model's parameters no longer need to fit on one chip at all — and
microbatches stream through the stages GPipe-style.

TPU-native shape of the idea:

- The scanned pair stack already stores parameters STACKED on a leading
  ``n_pairs`` axis (`models/dit.py` ``PairScan``). Pipeline sharding is
  just `PartitionSpec("pp")` on that axis — checkpoints, converters, and
  the single-chip layout are untouched.
- One SPMD program under `shard_map`: every stage runs the same
  ``M + S - 1`` tick loop; activations hop stage→stage via
  `lax.ppermute` over ICI. No per-stage programs, no host scheduling —
  XLA overlaps the permute with the next tick's compute.
- Built from differentiable primitives (scan/ppermute/where), so
  `jax.grad` through the schedule is the pipelined backward for free.

The GPipe bubble is the usual (S-1)/(M+S-1) idle fraction — under SPMD the
idle stages compute garbage ticks instead of idling, which costs the same
wall-clock and keeps the program shape static.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "gpipe",
    "pipelined_latte_forward",
    "pipelined_latte_img_forward",
    "pipelined_t2v_forward",
    "make_pipelined_apply",
]


def gpipe(
    stage_fn: Callable,
    stacked_params,
    x_mbs,
    mesh: Mesh,
    axis: str = "pp",
):
    """Run ``stage_fn`` over pipeline stages with microbatched inputs.

    Args:
      stage_fn: ``(params_local, x, unit_offset) -> x`` — applies this
        stage's chunk of units to one microbatch. ``params_local`` is the
        stacked-params pytree sliced to ``n_units // S`` on the leading
        axis; ``unit_offset`` is the absolute index of its first unit
        (device-varying int32).
      stacked_params: pytree, every leaf with leading dim ``n_units``
        (divisible by the axis size).
      x_mbs: pytree of microbatched inputs, every leaf ``(M, ...)``; the
        whole pytree is the per-microbatch activation carried stage to
        stage (constants that must follow a microbatch ride in here).
      mesh / axis: the pipeline axis.

    Returns the output pytree, every leaf ``(M, ...)``, replicated.
    """
    S = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    n_units = leaves[0].shape[0]
    assert n_units % S == 0, f"{n_units} units not divisible by pp={S}"
    L = n_units // S
    M = jax.tree_util.tree_leaves(x_mbs)[0].shape[0]

    def run(params_local, x_all):
        s = jax.lax.axis_index(axis)
        is_first_stage = s == 0
        is_last_stage = s == S - 1
        unit_offset = s * L

        def pick_mb(m):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.clip(m, 0, M - 1), 0, keepdims=False
                ),
                x_all,
            )

        def write_mb(buf, m, val):
            upd = jax.tree_util.tree_map(
                lambda b, v: jax.lax.dynamic_update_index_in_dim(
                    b, v, jnp.clip(m, 0, M - 1), 0
                ),
                buf,
                val,
            )
            write = jnp.logical_and(is_last_stage, m >= 0)
            return jax.tree_util.tree_map(
                lambda b, u: jnp.where(write, u, b), buf, upd
            )

        perm = [(j, (j + 1) % S) for j in range(S)]
        # the scan carry becomes device-varying inside the body (stage
        # predicates, ppermute) — mark the initial carry varying so the
        # carry type is fixed across iterations
        vary = lambda tree: jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, axis, to="varying"), tree
        )
        out0 = vary(jax.tree_util.tree_map(jnp.zeros_like, x_all))
        x0 = vary(pick_mb(jnp.int32(0)))

        def tick(carry, t):
            x_cur, out = carry
            # stage 0 ingests microbatch t; later stages use what arrived
            # over the ring at the end of the previous tick
            x_in = pick_mb(t)
            x_cur = jax.tree_util.tree_map(
                lambda a, b: jnp.where(is_first_stage, a, b), x_in, x_cur
            )
            y = stage_fn(params_local, x_cur, unit_offset)
            out = write_mb(out, t - (S - 1), y)
            y = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, perm), y
            )
            return (y, out), None

        (_, out), _ = jax.lax.scan(
            tick, (x0, out0), jnp.arange(M + S - 1, dtype=jnp.int32)
        )
        # only the last stage holds real outputs; mask-psum replicates them
        # (costs one all-reduce of the output — small next to the blocks)
        out = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(
                jnp.where(is_last_stage, a, jnp.zeros_like(a)), axis
            ),
            out,
        )
        return out

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    xspec = jax.tree_util.tree_map(lambda _: P(), x_mbs)
    # manual only over the pipeline axis: other mesh axes (dp, ...) stay in
    # auto mode, so gpipe composes with data parallelism under one jit
    fn = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(pspec, xspec),
        out_specs=xspec,
        axis_names={axis},
    )
    return fn(stacked_params, x_mbs)


def make_pipelined_apply(
    model, mesh: Mesh, microbatches: int, axis: str = "pp"
) -> Callable:
    """``model.apply``-signature adapter over the pipelined forward.

    Plugs into ``make_train_step(..., apply_fn=...)`` so the identical
    loss/optimizer/EMA step runs with the block stack depth-sharded over
    ``axis`` — training models whose parameters exceed one chip's HBM.
    Dispatches Latte vs LatteIMG (joint video+image batches) by model type.
    """
    from latte_tpu.models.dit_img import LatteIMG

    is_img = isinstance(model, LatteIMG)

    def apply_fn(
        variables,
        x,
        t,
        *,
        train=False,
        rngs=None,
        y=None,
        y_image=None,
        text_embedding=None,
        **kw,
    ):
        if kw:
            raise NotImplementedError(
                f"pipelined apply supports Latte/LatteIMG conditioning only "
                f"(got extra kwargs {sorted(kw)})"
            )
        common = dict(
            mesh=mesh,
            microbatches=microbatches,
            axis=axis,
            train=train,
            dropout_rng=(rngs or {}).get("label_dropout"),
        )
        if is_img:
            return pipelined_latte_img_forward(
                model, variables, x, t, y, y_image, text_embedding, **common
            )
        return pipelined_latte_forward(
            model, variables, x, t, y, text_embedding=text_embedding, **common
        )

    return apply_fn


def _run_pair_pipeline(
    pair,
    blocks_params,
    tokens: jnp.ndarray,  # (B*F, T, D)
    conds,  # tuple of B-major arrays (or None entries), e.g. (c_spatial, c_temp)
    temp_embed: jnp.ndarray,  # (1, Fv, D) — shared, closed over
    microbatches: int,
    mesh: Mesh,
    axis: str,
    dtype,
    remat: bool = False,
) -> jnp.ndarray:
    """Shared GPipe driver for the scanned (spatial, temporal) pair stacks.

    Latte, LatteIMG, and LatteT2V pairs all expose
    ``(x, (*conds, temp_embed), is_first) -> (x, aux)`` — only the
    conditioning arity differs. Every entry of ``conds`` is B-major on its
    leading axis (a multiple of the microbatch count) and rides the
    microbatch pytree stage-to-stage; ``None`` entries pass through. The
    microbatch axis is the sample batch B (temporal blocks mix frames
    within a sample, so frames cannot be split). ``remat`` rematerializes
    each pair application in the backward, mirroring the models'
    ``gradient_checkpointing`` flag."""
    BF, T, D = tokens.shape
    M = microbatches

    def apply_pair(pair_params, carry, cond, is_first):
        out, _ = pair.apply({"params": pair_params}, carry, cond, is_first)
        return out

    if remat:
        apply_pair = jax.checkpoint(apply_pair, prevent_cse=False)

    def stage_fn(params_local, xc, unit_offset):
        xt, *cs = xc

        def body(carry, sliced):
            pair_params, local_i = sliced
            is_first = ((unit_offset + local_i) == 0).astype(dtype)
            out = apply_pair(
                pair_params,
                carry,
                (*cs, temp_embed),
                is_first.reshape(1, 1, 1),
            )
            return out, None

        L = jax.tree_util.tree_leaves(params_local)[0].shape[0]
        xt, _ = jax.lax.scan(
            body, xt, (params_local, jnp.arange(L, dtype=jnp.int32))
        )
        return (xt, *cs)

    def mb(a):
        return (
            None
            if a is None
            else a.reshape(M, a.shape[0] // M, *a.shape[1:])
        )

    x_mbs = (mb(tokens), *(mb(c) for c in conds))
    out_mbs = gpipe(stage_fn, blocks_params, x_mbs, mesh, axis=axis)
    return out_mbs[0].reshape(BF, T, D)


def _apply_y_shell(model, params, y, y_image, train, dropout_rng):
    """Label embedding outside the module, with flax-exact rng semantics.

    Hosts a LabelEmbedder at scope path ('y_embedder',) — the path the
    models declare — and makes the SAME SEQUENCE of calls (y, then y_image
    when given), so make_rng('label_dropout') folds per-call counters
    identically and train-mode CFG dropout matches the model bit-exact.
    """
    from latte_tpu.models.embeddings import LabelEmbedder

    class _YShell(nn.Module):
        @nn.compact
        def __call__(self, y, y_image, train):
            emb = LabelEmbedder(
                num_classes=model.num_classes,
                hidden_size=model.hidden_size,
                dropout_prob=model.class_dropout_prob,
                dtype=model.dtype,
                name="y_embedder",
            )
            y_emb = emb(y, train=train)
            y_img_emb = None if y_image is None else emb(y_image, train=train)
            return y_emb, y_img_emb

    return _YShell().apply(
        {"params": {"y_embedder": params["y_embedder"]}},
        y,
        y_image,
        train,
        rngs={"label_dropout": dropout_rng} if train else None,
    )


def _apply_text_shell(model, params, txt_flat):
    """extras==78 text conditioner: Dense at the model's scope path."""

    class _TxtShell(nn.Module):
        @nn.compact
        def __call__(self, txt):
            return nn.Dense(
                model.hidden_size,
                dtype=model.dtype,
                name="text_embedding_projection",
            )(nn.silu(txt.astype(model.dtype)))

    return _TxtShell().apply(
        {
            "params": {
                "text_embedding_projection": params["text_embedding_projection"]
            }
        },
        txt_flat,
    )


def pipelined_latte_forward(
    model,
    variables,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pp",
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    text_embedding: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Latte forward with the pair stack pipelined over ``axis``.

    Orchestration mirrors `models/dit.py` ``Latte.__call__`` (embed →
    pairs → final layer) — equality with ``model.apply`` is pinned by
    `tests/test_pipeline.py`, so drift between the two is caught. The
    microbatch axis is the sample batch ``B`` (temporal blocks mix frames
    within a sample, so frames cannot be split): ``B % microbatches == 0``.

    Non-block parameters (embedders, final layer) are tiny and stay
    replicated; only the stacked pair weights shard over ``pp``.
    """
    from latte_tpu.models.dit import SpatioTemporalPair
    from latte_tpu.models.embeddings import (
        TimestepEmbedder,
        get_1d_sincos_pos_embed,
        get_2d_sincos_pos_embed,
    )
    from latte_tpu.models.layers import FinalLayer, PatchEmbed, unpatchify

    params = variables["params"]
    B, F, C, H, W = x.shape
    in_dtype = x.dtype
    p = model.patch_size
    M = microbatches
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"

    tokens = PatchEmbed(
        patch_size=p, hidden_size=model.hidden_size, dtype=model.dtype
    ).apply({"params": params["x_embedder"]}, x.reshape(B * F, C, H, W))
    T = tokens.shape[1]
    pos = jnp.asarray(
        get_2d_sincos_pos_embed(model.hidden_size, H // p), dtype=model.dtype
    )[None]
    temp_embed = jnp.asarray(
        get_1d_sincos_pos_embed(model.hidden_size, F), dtype=model.dtype
    )[None]
    tokens = tokens + pos

    t_emb = TimestepEmbedder(hidden_size=model.hidden_size, dtype=model.dtype).apply(
        {"params": params["t_embedder"]}, t
    )
    c_spatial = jnp.repeat(t_emb, F, axis=0)
    c_temp = jnp.repeat(t_emb, T, axis=0)
    if model.extras == 2:
        y_emb = _apply_y_shell(model, params, y, None, train, dropout_rng)[0]
        c_spatial = c_spatial + jnp.repeat(y_emb, F, axis=0)
        c_temp = c_temp + jnp.repeat(y_emb, T, axis=0)
    elif model.extras == 78:
        txt = _apply_text_shell(
            model, params, text_embedding.reshape(B, -1)
        )
        c_spatial = c_spatial + jnp.repeat(txt, F, axis=0)
        c_temp = c_temp + jnp.repeat(txt, T, axis=0)

    pair = SpatioTemporalPair(
        hidden_size=model.hidden_size,
        num_heads=model.num_heads,
        mlp_ratio=model.mlp_ratio,
        attention_mode=model.attention_mode,
        quantized=model.quantized,
        moe_experts=model.moe_experts,
        moe_top_k=model.moe_top_k,
        moe_capacity_factor=model.moe_capacity_factor,
        dtype=model.dtype,
    )
    tokens = _run_pair_pipeline(
        pair, params["blocks"], tokens, (c_spatial, c_temp), temp_embed,
        M, mesh, axis, model.dtype,
        remat=model.gradient_checkpointing,
    )

    # text path (extras==78) conditions the final layer on timestep only,
    # matching `models/dit.py` L266-268
    c_final = (
        c_spatial if model.extras == 2 else jnp.repeat(t_emb, F, axis=0)
    )
    tokens = FinalLayer(
        hidden_size=model.hidden_size,
        patch_size=p,
        out_channels=model.out_channels,
        dtype=model.dtype,
    ).apply({"params": params["final_layer"]}, tokens, c_final)
    out = unpatchify(tokens, p, model.out_channels)
    return out.reshape(B, F, model.out_channels, H, W).astype(in_dtype)


def pipelined_latte_img_forward(
    model,
    variables,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    y_image: Optional[jnp.ndarray] = None,
    text_embedding: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pp",
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """LatteIMG (joint video+image) forward pipelined over ``axis``.

    Mirrors `models/dit_img.py` ``LatteIMG.__call__``: the frame axis
    carries ``num_frames`` video frames then ``use_image_num`` stills
    (train mode); temporal blocks touch only the video frames inside the
    pair, so the pipeline machinery is identical to Latte's. Per-image
    labels reuse the shared y_embedder with flax-exact dropout rng
    sequencing (`_apply_y_shell`)."""
    from latte_tpu.models.dit_img import JointSpatioTemporalPair
    from latte_tpu.models.embeddings import (
        TimestepEmbedder,
        get_1d_sincos_pos_embed,
        get_2d_sincos_pos_embed,
    )
    from latte_tpu.models.layers import FinalLayer, PatchEmbed, unpatchify

    params = variables["params"]
    B, Ftot, C, H, W = x.shape
    in_dtype = x.dtype
    p = model.patch_size
    Fv = Ftot - (model.use_image_num if train else 0)
    M = microbatches
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"

    tokens = PatchEmbed(
        patch_size=p, hidden_size=model.hidden_size, dtype=model.dtype
    ).apply({"params": params["x_embedder"]}, x.reshape(B * Ftot, C, H, W))
    T = tokens.shape[1]
    pos = jnp.asarray(
        get_2d_sincos_pos_embed(model.hidden_size, H // p), dtype=model.dtype
    )[None]
    temp_embed = jnp.asarray(
        get_1d_sincos_pos_embed(model.hidden_size, Fv), dtype=model.dtype
    )[None]
    tokens = tokens + pos

    t_emb = TimestepEmbedder(hidden_size=model.hidden_size, dtype=model.dtype).apply(
        {"params": params["t_embedder"]}, t
    )
    c_spatial = jnp.repeat(t_emb, Ftot, axis=0)
    c_temp = jnp.repeat(t_emb, T, axis=0)

    if model.extras == 2:
        joint = train and model.use_image_num > 0 and y_image is not None
        y_emb, y_img_emb = _apply_y_shell(
            model, params, y, y_image if joint else None, train, dropout_rng
        )
        if joint:
            y_spatial = jnp.concatenate(
                [jnp.repeat(y_emb[:, None, :], Fv, axis=1), y_img_emb], axis=1
            ).reshape(B * Ftot, -1)
        else:
            y_spatial = jnp.repeat(y_emb, Ftot, axis=0)
        c_spatial = c_spatial + y_spatial
        c_temp = c_temp + jnp.repeat(y_emb, T, axis=0)
    elif model.extras == 78:
        # per-frame text rows: row 0 for all video frames, rows 1..I per
        # still image (`models/dit_img.py` L182-197)
        txt = _apply_text_shell(model, params, text_embedding)
        txt_video = jnp.repeat(txt[:, :1], Fv, axis=1)
        txt_spatial = jnp.concatenate([txt_video, txt[:, 1:]], axis=1)
        c_spatial = c_spatial + txt_spatial.reshape(B * Ftot, -1)
        c_temp = c_temp + jnp.repeat(txt[:, 0], T, axis=0)

    pair = JointSpatioTemporalPair(
        hidden_size=model.hidden_size,
        num_heads=model.num_heads,
        num_video_frames=Fv,
        mlp_ratio=model.mlp_ratio,
        attention_mode=model.attention_mode,
        quantized=model.quantized,
        moe_experts=model.moe_experts,
        moe_top_k=model.moe_top_k,
        moe_capacity_factor=model.moe_capacity_factor,
        dtype=model.dtype,
    )
    tokens = _run_pair_pipeline(
        pair, params["blocks"], tokens, (c_spatial, c_temp), temp_embed,
        M, mesh, axis, model.dtype,
        remat=model.gradient_checkpointing,
    )

    tokens = FinalLayer(
        hidden_size=model.hidden_size,
        patch_size=p,
        out_channels=model.out_channels,
        dtype=model.dtype,
    ).apply({"params": params["final_layer"]}, tokens, c_spatial)
    out = unpatchify(tokens, p, model.out_channels)
    return out.reshape(B, Ftot, model.out_channels, H, W).astype(in_dtype)


def pipelined_t2v_forward(
    model,
    variables,
    hidden_states: jnp.ndarray,
    timestep: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pp",
    use_image_num: int = 0,
    train: bool = False,
) -> jnp.ndarray:
    """LatteT2V forward with the block stack pipelined over ``axis``.

    The serving-side counterpart of :func:`pipelined_latte_forward`: a
    text-to-video checkpoint whose transformer exceeds one chip's HBM runs
    depth-sharded, each stage holding ``num_layers / pp`` scanned pairs.
    Orchestration mirrors `models/t2v.py` ``LatteT2V.__call__`` (patchify →
    adaLN-single + caption projection → pairs → scale-shift projection);
    parity with ``model.apply`` is pinned by `tests/test_pipeline.py`.
    Conditioning (per-frame modulation, caption context, mask bias) rides
    the microbatch pytree stage-to-stage; the shared ``temp_pos_embed`` is
    closed over (identical for every microbatch).
    """
    from latte_tpu.models.embeddings import (
        get_1d_sincos_pos_embed,
        get_2d_sincos_pos_embed,
    )
    from latte_tpu.models.layers import PatchEmbed
    from latte_tpu.models.t2v import (
        AdaLayerNormSingle,
        CaptionProjection,
        T2VPair,
    )

    params = variables["params"]
    B, C, Ftot, H, W = hidden_states.shape
    D = model.inner_dim
    Fv = Ftot - use_image_num
    p = model.patch_size
    in_dtype = hidden_states.dtype
    M = microbatches
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"

    x = hidden_states.transpose(0, 2, 1, 3, 4).reshape(B * Ftot, C, H, W)
    x = PatchEmbed(patch_size=p, hidden_size=D, dtype=model.dtype).apply(
        {"params": params["pos_embed"]}, x
    )
    T = x.shape[1]
    pos = jnp.asarray(get_2d_sincos_pos_embed(D, H // p), dtype=model.dtype)[None]
    x = x + pos
    temp_pos_embed = jnp.asarray(
        get_1d_sincos_pos_embed(D, Fv), dtype=model.dtype
    )[None]

    t_mod, embedded_t = AdaLayerNormSingle(dim=D, dtype=model.dtype).apply(
        {"params": params["adaln_single"]}, timestep
    )
    t_spatial = jnp.repeat(t_mod, Ftot, axis=0)
    t_temp = jnp.repeat(t_mod, T, axis=0)

    ctx = CaptionProjection(hidden_size=D, dtype=model.dtype).apply(
        {"params": params["caption_projection"]}, encoder_hidden_states
    )
    if use_image_num and train:
        ctx_video = jnp.repeat(ctx[:, :1], Fv, axis=1)
        ctx_sp = jnp.concatenate([ctx_video, ctx[:, 1:]], axis=1)
        ctx_sp = ctx_sp.reshape(B * Ftot, *ctx_sp.shape[2:])
    else:
        ctx_sp = jnp.repeat(ctx, Ftot, axis=0)

    ctx_bias = None
    if encoder_attention_mask is not None:
        if encoder_attention_mask.ndim == 2:
            bias = (1.0 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
            ctx_bias = jnp.repeat(bias[:, None, :], Ftot, axis=0).reshape(
                B * Ftot, 1, -1
            )
        else:
            bias = (1.0 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
            bias_video = jnp.repeat(bias[:, :1], Fv, axis=1)
            bias = jnp.concatenate([bias_video, bias[:, 1:]], axis=1)
            ctx_bias = bias.reshape(B * Ftot, 1, -1)

    pair = T2VPair(
        dim=D,
        num_heads=model.num_attention_heads,
        head_dim=model.attention_head_dim,
        num_video_frames=Fv,
        enable_temporal_attentions=model.enable_temporal_attentions,
        activation_fn=model.activation_fn,
        attention_mode=model.attention_mode,
        ff_chunk_size=model.feed_forward_chunk_size,
        quantized=model.quantized,
        moe_experts=model.moe_experts,
        moe_top_k=model.moe_top_k,
        moe_capacity_factor=model.moe_capacity_factor,
        dtype=model.dtype,
    )

    x = _run_pair_pipeline(
        pair,
        params["blocks"],
        x,
        (t_spatial, t_temp, ctx_sp, ctx_bias),
        temp_pos_embed,
        M,
        mesh,
        axis,
        model.dtype,
        remat=model.gradient_checkpointing,
    )

    class _FinalShell(nn.Module):
        # scale_shift_table is a root-level param of LatteT2V and norm_out
        # is parameterless (no bias/scale) — the shell reproduces the exact
        # module math (`models/t2v.py` L528-539) from the params subset
        @nn.compact
        def __call__(self, h, emb_sp):
            out_table = self.param(
                "scale_shift_table",
                nn.initializers.normal(stddev=D**-0.5),
                (2, D),
            )
            shift, scale = jnp.split(
                out_table[None] + emb_sp[:, None, :], 2, axis=1
            )
            h = nn.LayerNorm(
                epsilon=1e-6,
                use_bias=False,
                use_scale=False,
                dtype=model.dtype,
                name="norm_out",
            )(h)
            h = h * (1 + scale.astype(model.dtype)) + shift.astype(model.dtype)
            return nn.Dense(
                p * p * model.out_channels, dtype=model.dtype, name="proj_out"
            )(h)

    emb_sp = jnp.repeat(embedded_t, Ftot, axis=0)
    x = _FinalShell().apply(
        {
            "params": {
                "scale_shift_table": params["scale_shift_table"],
                "proj_out": params["proj_out"],
            }
        },
        x,
        emb_sp,
    )

    h_p, w_p = H // p, W // p
    x = x.reshape(B * Ftot, h_p, w_p, p, p, model.out_channels)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    x = x.reshape(B, Ftot, model.out_channels, H, W).transpose(0, 2, 1, 3, 4)
    return x.astype(in_dtype)
