"""LatteT2V: text-to-video DiT (Flax).

Capability parity with `/root/reference/models/latte_t2v.py:444-945` (the
diffusers/PixArt-α idiom): per-frame PatchEmbed, pairs of
- spatial blocks: self-attention + T5 cross-attention, adaLN-single
  modulation via a per-block ``scale_shift_table`` (6, D) + shared
  timestep projection (`latte_t2v.py:294-300,398-428`),
- temporal blocks: self-attention only (`BasicTransformerBlock_`,
  `latte_t2v.py:125-396`), temporal sincos pos-embed added before pair 0,
followed by an adaLN-single output projection with a (2, D) table
(`latte_t2v.py:910-936`). Supports joint video+image training
(``use_image_num``) with per-image caption states (`latte_t2v.py:793-800`),
``enable_temporal_attentions`` and video-length interpolation.

TPU-first: scanned block pairs (single trace), flash attention for the long
spatial sequences, fused XLA attention for temporal/cross, static shapes
with additive -1e4 key masks instead of variable-length truncation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from latte_tpu.models.embeddings import (
    TimestepEmbedder,
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
)
from latte_tpu.models.layers import PatchEmbed, QDense

xavier = nn.initializers.xavier_uniform



def _remat_policy(name):
    """Named rematerialization policies for the scanned block pairs.

    - "full": recompute everything in the backward (max memory savings).
    - "dots": save MXU (matmul) outputs, recompute elementwise chains --
      skips the forward matmul replay in the backward at some activation
      memory cost (jax.checkpoint_policies.dots_with_no_batch_dims_saveable).
    """
    if name in (None, "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r} (use 'full' or 'dots')")

class T2VFeedForward(nn.Module):
    """diffusers FeedForward: geglu | gelu-approximate projection in.

    ``chunk_size`` bounds FF activation memory by running the MLP over
    token-axis slices (reference `latte_t2v.py:267-270,368-383`
    ``set_chunk_feed_forward``): the 4×D hidden is live for only one chunk
    at a time.  On TPU the first-line memory tools are remat + the scanned
    block pairs; this is the reference-parity knob for the FF term.
    """

    dim: int
    mult: int = 4
    activation_fn: str = "gelu-approximate"
    chunk_size: Optional[int] = None
    quantized: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.activation_fn == "geglu":
            proj_in = QDense(inner * 2, quantized=self.quantized, dtype=self.dtype, name="net_0_proj")
        elif self.activation_fn == "gelu-approximate":
            proj_in = QDense(inner, quantized=self.quantized, dtype=self.dtype, name="net_0_proj")
        else:
            raise NotImplementedError(self.activation_fn)
        proj_out = QDense(self.dim, quantized=self.quantized, dtype=self.dtype, name="net_2")

        def ff(h):
            h = proj_in(h)
            if self.activation_fn == "geglu":
                h, gate = jnp.split(h, 2, axis=-1)
                h = h * nn.gelu(gate, approximate=False)
            else:
                h = nn.gelu(h, approximate=True)
            return proj_out(h)

        if self.chunk_size is None:
            return ff(x)
        T = x.shape[1]
        if T % self.chunk_size != 0:
            raise ValueError(
                f"token axis {T} not divisible by feed-forward chunk size "
                f"{self.chunk_size}"
            )
        n = T // self.chunk_size
        return jnp.concatenate(
            [ff(x[:, i * self.chunk_size : (i + 1) * self.chunk_size]) for i in range(n)],
            axis=1,
        )


def _make_ff(blk) -> nn.Module:
    """FF module for a T2V block: MoE expert FFs when moe_experts > 1
    (MoE replaces ff_chunk_size outright — static expert capacity already
    bounds the live 4×D activation), the dense T2VFeedForward otherwise.
    Shared by T2VSpatialBlock and T2VTemporalBlock."""
    if blk.moe_experts > 1:
        from latte_tpu.models.moe import MoEMlp

        if blk.quantized:
            # no int8 path for the expert einsums — fail loudly rather
            # than silently serving a full-precision FF
            raise NotImplementedError(
                "quantized (W8A8/QAT) + moe_experts is not supported: "
                "MoEMlp has no int8 expert path"
            )
        return MoEMlp(
            hidden_features=blk.dim * 4,
            out_features=blk.dim,
            num_experts=blk.moe_experts,
            top_k=blk.moe_top_k,
            capacity_factor=blk.moe_capacity_factor,
            ep_axis=blk.moe_ep_axis,
            activation_fn=blk.activation_fn,
            dtype=blk.dtype,
            name="moe",
        )
    return T2VFeedForward(
        dim=blk.dim, activation_fn=blk.activation_fn,
        chunk_size=blk.ff_chunk_size, quantized=blk.quantized,
        dtype=blk.dtype, name="ff"
    )


class MultiHeadCrossAttention(nn.Module):
    """diffusers-style attention: separate q/k/v projections, optional
    cross-attention states and additive key-bias mask."""

    dim: int
    num_heads: int
    head_dim: int
    qkv_bias: bool = True
    mode: str = "auto"
    quantized: bool = False
    ring_mesh: Optional[object] = None  # jax.sharding.Mesh (static field)
    ring_axis: str = "sp"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, N, _ = x.shape
        inner = self.num_heads * self.head_dim
        kv = x if context is None else context
        M = kv.shape[1]
        q = QDense(inner, use_bias=self.qkv_bias, quantized=self.quantized, dtype=self.dtype, name="to_q")(x)
        k = QDense(inner, use_bias=self.qkv_bias, quantized=self.quantized, dtype=self.dtype, name="to_k")(kv)
        v = QDense(inner, use_bias=self.qkv_bias, quantized=self.quantized, dtype=self.dtype, name="to_v")(kv)
        q = q.reshape(B, N, self.num_heads, self.head_dim)
        k = k.reshape(B, M, self.num_heads, self.head_dim)
        v = v.reshape(B, M, self.num_heads, self.head_dim)

        mode = self.mode
        if mode == "auto":
            mode = (
                "flash"
                if (context is None and mask_bias is None and N >= 512 and N % 128 == 0)
                else "xla"
            )
        if mode == "ring":
            if self.ring_mesh is None:
                raise ValueError(
                    "attention_mode='ring' requires constructing the model "
                    "with ring_mesh=<jax.sharding.Mesh>"
                )
            # ring applies to self-attention only; cross-attention K/V (T5
            # states) are short and masked — keep them on the XLA path
            ok = (
                context is None
                and mask_bias is None
                and N % self.ring_mesh.shape[self.ring_axis] == 0
            )
            mode = "ring" if ok else "xla"
        if mode == "ring":
            from latte_tpu.dist.ring import ring_attention_sharded

            out = ring_attention_sharded(q, k, v, self.ring_mesh, self.ring_axis)
        elif mode == "flash":
            from latte_tpu.kernels.attention import flash_attention

            out = flash_attention(q, k, v)
        else:
            # native-dtype matmul, fp32 accumulation (see layers.Attention:
            # an up-cast of already-bf16 inputs only slows the MXU)
            scale = self.head_dim**-0.5
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            if mask_bias is not None:
                # mask_bias: (B, 1, M) additive (0 keep / -1e4 drop)
                logits = logits + mask_bias[:, None, :, :]  # -> (B, 1, 1, M)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
        out = out.reshape(B, N, inner)
        return QDense(self.dim, quantized=self.quantized, dtype=self.dtype, name="to_out")(out)


class T2VSpatialBlock(nn.Module):
    """adaLN-single block: self-attn -> cross-attn (T5) -> FF."""

    dim: int
    num_heads: int
    head_dim: int
    activation_fn: str = "gelu-approximate"
    attention_mode: str = "auto"
    ff_chunk_size: Optional[int] = None
    quantized: bool = False
    ring_mesh: Optional[object] = None
    ring_axis: str = "sp"
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timestep_mod, context, context_mask_bias):
        B = x.shape[0]
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=self.dim**-0.5),
            (6, self.dim),
        )
        mods = table[None] + timestep_mod.reshape(B, 6, -1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m.astype(self.dtype) for m in jnp.split(mods, 6, axis=1)
        ]
        h = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm1"
        )(x)
        h = h * (1 + scale_msa) + shift_msa
        attn = MultiHeadCrossAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            mode=self.attention_mode,
            quantized=self.quantized,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            dtype=self.dtype,
            name="attn1",
        )(h)
        x = x + gate_msa * attn
        # cross-attention: no norm for ada_norm_single (PixArt quirk)
        x = x + MultiHeadCrossAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            mode="xla",
            quantized=self.quantized,
            dtype=self.dtype,
            name="attn2",
        )(x, context=context, mask_bias=context_mask_bias)
        h = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm3"
        )(x)
        h = h * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * _make_ff(self)(h)
        return x


class T2VTemporalBlock(nn.Module):
    """adaLN-single self-attention-only block (`BasicTransformerBlock_`)."""

    dim: int
    num_heads: int
    head_dim: int
    activation_fn: str = "gelu-approximate"
    attention_mode: str = "auto"
    ff_chunk_size: Optional[int] = None
    quantized: bool = False
    ring_mesh: Optional[object] = None
    ring_axis: str = "sp"
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timestep_mod):
        B = x.shape[0]
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=self.dim**-0.5),
            (6, self.dim),
        )
        mods = table[None] + timestep_mod.reshape(B, 6, -1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m.astype(self.dtype) for m in jnp.split(mods, 6, axis=1)
        ]
        h = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm1"
        )(x)
        h = h * (1 + scale_msa) + shift_msa
        attn = MultiHeadCrossAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            mode=self.attention_mode,
            quantized=self.quantized,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            dtype=self.dtype,
            name="attn1",
        )(h)
        x = x + gate_msa * attn
        h = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm3"
        )(x)
        h = h * (1 + scale_mlp) + shift_mlp
        x = x + gate_mlp * _make_ff(self)(h)
        return x


class AdaLayerNormSingle(nn.Module):
    """Shared timestep conditioning (PixArt adaLN-single,
    `latte_t2v.py:398-428`): sincos(256) -> MLP(D) -> silu -> Dense(6D)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        emb = TimestepEmbedder(hidden_size=self.dim, dtype=self.dtype, name="emb")(t)
        mod = nn.Dense(6 * self.dim, dtype=self.dtype, kernel_init=xavier(), name="linear")(
            nn.silu(emb)
        )
        return mod, emb


class CaptionProjection(nn.Module):
    """T5 feature projection (`latte_t2v.py:662-664`)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, caption: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_size, dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02), name="linear_1",
        )(caption.astype(self.dtype))
        x = nn.gelu(x, approximate=True)
        return nn.Dense(
            self.hidden_size, dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02), name="linear_2",
        )(x)


class T2VPair(nn.Module):
    """Scanned (spatial, temporal) pair for LatteT2V."""

    dim: int
    num_heads: int
    head_dim: int
    num_video_frames: int
    enable_temporal_attentions: bool = True
    activation_fn: str = "gelu-approximate"
    attention_mode: str = "auto"
    ff_chunk_size: Optional[int] = None
    quantized: bool = False
    ring_mesh: Optional[object] = None
    ring_axis: str = "sp"
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    # >= 0: the scan carry grows a `saved` slot capturing the activation
    # AFTER pair index save_front_idx (block-cache serving, see
    # `LatteT2V.__call__` return_front) — params are unaffected
    save_front_idx: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, cond, is_first):
        if self.save_front_idx >= 0:
            x, saved = carry
            is_first, save_flag = is_first
        else:
            x = carry
        (t_spatial, t_temp, context_sp, ctx_bias, temp_pos_embed) = cond
        Fv = self.num_video_frames
        BF, T, D = x.shape
        B = t_temp.shape[0] // T

        moe_kw = dict(
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_ep_axis=self.moe_ep_axis,
        )
        x = T2VSpatialBlock(
            dim=self.dim,
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            activation_fn=self.activation_fn,
            attention_mode=self.attention_mode,
            ff_chunk_size=self.ff_chunk_size,
            quantized=self.quantized,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            dtype=self.dtype,
            name="spatial",
            **moe_kw,
        )(x, t_spatial, context_sp, ctx_bias)

        if self.enable_temporal_attentions:
            Ftot = BF // B
            x = x.reshape(B, Ftot, T, D).transpose(0, 2, 1, 3).reshape(B * T, Ftot, D)
            x_video, x_image = x[:, :Fv], x[:, Fv:]
            if Fv > 1:
                x_video = x_video + is_first.astype(x.dtype) * temp_pos_embed
            x_video = T2VTemporalBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                activation_fn=self.activation_fn,
                attention_mode=self.attention_mode,
                # FF chunking targets the spatial token axis (H·W/p² tokens,
                # where the 4×D activation memory lives); the temporal
                # block's token axis is only F frames, so chunking it buys
                # nothing and would impose F % chunk == 0.
                quantized=self.quantized,
                ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis,
                dtype=self.dtype,
                name="temporal",
                **moe_kw,
            )(x_video, t_temp)
            x = jnp.concatenate([x_video, x_image], axis=1)
            x = x.reshape(B, T, Ftot, D).transpose(0, 2, 1, 3).reshape(B * Ftot, T, D)
        # when temporal attentions are disabled (t2i), temporal params are
        # simply never created/used; apply() tolerates extra params when
        # loading a full T2V checkpoint.
        if self.save_front_idx >= 0:
            saved = jnp.where(save_flag, x, saved)
            return (x, saved), None
        return x, None


class LatteT2V(nn.Module):
    """Text-to-video transformer. Input (B, C, F(+I), H, W) + T5 states."""

    num_attention_heads: int = 16
    attention_head_dim: int = 72
    in_channels: int = 4
    out_channels: int = 8
    num_layers: int = 28
    patch_size: int = 2
    sample_size: int = 64
    cross_attention_dim: int = 1152
    caption_channels: int = 4096
    video_length: int = 16
    activation_fn: str = "gelu-approximate"
    attention_mode: str = "auto"
    enable_temporal_attentions: bool = True
    feed_forward_chunk_size: Optional[int] = None
    # W8A8 int8 serving for the hot projections (to_q/k/v/out, FF);
    # params from latte_tpu.quant.quantize_params
    quantized: bool = False
    # attention_mode="ring": self-attention token axes sharded over
    # ring_axis of ring_mesh (cross-attention stays local)
    ring_mesh: Optional[object] = None
    ring_axis: str = "sp"
    # Mixture-of-Experts FF (models/moe.py): >1 swaps each block's FF for
    # E expert FFs (same activation_fn incl. geglu) + a top-k router;
    # expert weights shard over the mesh "ep" axis (moe_ep_axis)
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    gradient_checkpointing: bool = False
    # remat policy when gradient_checkpointing: "full" | "dots"
    remat_policy: str = "full"
    unroll_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        encoder_attention_mask: Optional[jnp.ndarray] = None,
        use_image_num: int = 0,
        train: bool = False,
        front_state: Optional[jnp.ndarray] = None,
        start_pair: int = 0,
        return_front: int = 0,
    ) -> jnp.ndarray:
        # front_state/start_pair/return_front: block-cache serving staging
        # hooks — same contract as `latte_tpu/models/dit.py Latte.__call__`
        # (see `latte_tpu/core/block_cache.py`).
        if return_front and front_state is not None:
            raise ValueError("return_front and front_state are exclusive")
        if (front_state is None) != (start_pair == 0):
            raise ValueError("front_state and start_pair must be set together")
        B, C, Ftot, H, W = hidden_states.shape
        D = self.inner_dim
        Fv = Ftot - use_image_num
        p = self.patch_size
        in_dtype = hidden_states.dtype

        temp_pos_embed = jnp.asarray(
            get_1d_sincos_pos_embed(D, Fv), dtype=self.dtype
        )[None]
        if front_state is None:
            # (b c f h w) -> (b f) c h w, per-frame patchify + 2d pos embed
            x = hidden_states.transpose(0, 2, 1, 3, 4).reshape(B * Ftot, C, H, W)
            x = PatchEmbed(
                patch_size=p, hidden_size=D, dtype=self.dtype, name="pos_embed"
            )(x)
            T = x.shape[1]
            pos = jnp.asarray(get_2d_sincos_pos_embed(D, H // p), dtype=self.dtype)[None]
            x = x + pos
        else:
            x = front_state
            T = x.shape[1]

        t_mod, embedded_t = AdaLayerNormSingle(
            dim=D, dtype=self.dtype, name="adaln_single"
        )(timestep)
        t_spatial = jnp.repeat(t_mod, Ftot, axis=0)  # (B*Ftot, 6D)
        t_temp = jnp.repeat(t_mod, T, axis=0)  # (B*T, 6D)

        ctx = CaptionProjection(
            hidden_size=D, dtype=self.dtype, name="caption_projection"
        )(encoder_hidden_states)
        if use_image_num and train:
            # ctx: (B, 1+I, L, D): caption 0 for all video frames, then
            # one caption per joint image (`latte_t2v.py:793-800`)
            ctx_video = jnp.repeat(ctx[:, :1], Fv, axis=1)
            ctx_sp = jnp.concatenate([ctx_video, ctx[:, 1:]], axis=1)
            ctx_sp = ctx_sp.reshape(B * Ftot, *ctx_sp.shape[2:])
        else:
            ctx_sp = jnp.repeat(ctx, Ftot, axis=0)  # (B*F, L, D)

        ctx_bias = None
        if encoder_attention_mask is not None:
            if encoder_attention_mask.ndim == 2:  # (B, L), 1=keep
                bias = (1.0 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
                ctx_bias = jnp.repeat(bias[:, None, :], Ftot, axis=0).reshape(
                    B * Ftot, 1, -1
                )
            else:  # (B, 1+I, L) joint form
                bias = (1.0 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
                bias_video = jnp.repeat(bias[:, :1], Fv, axis=1)
                bias = jnp.concatenate([bias_video, bias[:, 1:]], axis=1)
                ctx_bias = bias.reshape(B * Ftot, 1, -1)

        n_pairs = self.num_layers - start_pair
        pair_cls = T2VPair
        if self.gradient_checkpointing:
            policy = _remat_policy(self.remat_policy)
            kw_remat = {"policy": policy} if policy is not None else {}
            pair_cls = nn.remat(pair_cls, prevent_cse=False, **kw_remat)
        PairScan = nn.scan(
            pair_cls,
            # "intermediates" stacks the sown MoE aux losses per pair (a
            # no-op unless applied with mutable=["intermediates"])
            variable_axes={"params": 0, "intermediates": 0, "calib": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, 0),
            length=n_pairs,
            unroll=n_pairs if self.unroll_blocks else 1,
        )
        is_first = (
            (jnp.arange(n_pairs) + start_pair == 0)
            .astype(self.dtype)
            .reshape(n_pairs, 1, 1, 1)
        )
        flags = is_first
        carry = x
        if return_front:
            save_flag = (jnp.arange(n_pairs) == return_front - 1).reshape(
                n_pairs, 1, 1, 1
            )
            flags = (is_first, save_flag)
            carry = (x, jnp.zeros_like(x))
        carry, _ = PairScan(
            dim=D,
            num_heads=self.num_attention_heads,
            head_dim=self.attention_head_dim,
            num_video_frames=Fv,
            enable_temporal_attentions=self.enable_temporal_attentions,
            activation_fn=self.activation_fn,
            attention_mode=self.attention_mode,
            ff_chunk_size=self.feed_forward_chunk_size,
            quantized=self.quantized,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_ep_axis=self.moe_ep_axis,
            save_front_idx=(return_front - 1) if return_front else -1,
            dtype=self.dtype,
            name="blocks",
        )(carry, (t_spatial, t_temp, ctx_sp, ctx_bias, temp_pos_embed), flags)
        if return_front:
            x, front_saved = carry
        else:
            x = carry

        # adaLN-single output projection (`latte_t2v.py:921-929`)
        out_table = self.param(
            "scale_shift_table", nn.initializers.normal(stddev=D**-0.5), (2, D)
        )
        emb_sp = jnp.repeat(embedded_t, Ftot, axis=0)  # (B*Ftot, D)
        shift, scale = jnp.split(out_table[None] + emb_sp[:, None, :], 2, axis=1)
        x = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm_out"
        )(x)
        x = x * (1 + scale.astype(self.dtype)) + shift.astype(self.dtype)
        x = nn.Dense(
            p * p * self.out_channels, dtype=self.dtype, kernel_init=xavier(), name="proj_out"
        )(x)

        # unpatchify to (B, C_out, F, H, W)
        h_p, w_p = H // p, W // p
        x = x.reshape(B * Ftot, h_p, w_p, p, p, self.out_channels)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        x = x.reshape(B, Ftot, self.out_channels, H, W).transpose(0, 2, 1, 3, 4)
        out = x.astype(in_dtype)
        if return_front:
            return out, front_saved
        return out
