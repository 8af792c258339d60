"""Latte: factorized spatio-temporal video DiT (Flax).

Capability parity with the reference core model
(`/root/reference/models/latte.py:204-398`): per-frame patchify, interleaved
spatial (HW-token) / temporal (F-token) transformer blocks with adaLN-Zero
conditioning, frozen sin-cos positional tables, learned-sigma output, and
the 4-channel CFG forward.

TPU-first design choices (not in the reference):
- The depth/2 (spatial, temporal) block pairs run under `flax.linen.scan`
  with stacked parameters — one trace instead of 14, so the whole stack
  compiles to a single fused XLA while-loop and compile time stays flat in
  depth.
- The (b f) t d <-> (b t) f d relayouts are pure reshape/transposes on a
  (B, F, T, D) carry, which XLA keeps as cheap relayouts.
- Attention dispatches to the Pallas flash kernel for long (spatial) token
  sequences and to a fused XLA path for short (temporal) ones.
- Sequence parallelism (`activation_sharding`): the fused batch·token
  leading dim is sharded over the given mesh axes (e.g. ``("dp", "sp")``)
  via `with_sharding_constraint`. Spatial blocks shard over frames,
  temporal blocks over patches; the (b f) t d <-> (b t) f d relayout then
  compiles to one all-to-all per transition riding ICI — long-video
  scaling the reference's pure-DDP design cannot express. The caller must
  jit under a `Mesh` context that defines the named axes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from latte_tpu.models.embeddings import (
    LabelEmbedder,
    TimestepEmbedder,
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
)
from latte_tpu.models.layers import AdaLNBlock, FinalLayer, PatchEmbed, unpatchify



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

class SpatioTemporalPair(nn.Module):
    """One (spatial block, temporal block) pair — the scanned unit.

    Carry ``x`` has shape (B·F, T, D) (spatial token layout). ``cond`` is the
    broadcast tuple (c_spatial, c_temp, temp_embed); ``is_first`` is the
    scanned per-iteration flag that gates the temporal positional embedding
    (the reference adds it only before the first temporal block,
    `models/latte.py:357-358`).
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    attention_mode: str = "auto"
    quantized: bool = False
    int8_attention: object = False  # False|True/'full'|'qk' — see layers.Attention
    ring_mesh: Optional[object] = None
    ring_axis: str = "sp"
    activation_sharding: Optional[Tuple[str, ...]] = None
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    fused_adaln: bool = False
    # >= 0: the scan carry grows a `saved` slot capturing the activation
    # AFTER pair index save_front_idx (block-cache serving, see
    # `Latte.__call__` return_front) — params are unaffected
    save_front_idx: int = -1
    dtype: jnp.dtype = jnp.float32

    def _constrain(self, x):
        if self.activation_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, PartitionSpec(tuple(self.activation_sharding), None, None)
        )

    @nn.compact
    def __call__(
        self,
        carry,
        cond: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        is_first: jnp.ndarray,
    ):
        if self.save_front_idx >= 0:
            x, saved = carry
            is_first, save_flag = is_first
        else:
            x = carry
        c_spatial, c_temp, temp_embed = cond
        F = temp_embed.shape[1]
        BF, T, D = x.shape
        B = BF // F

        moe_kw = dict(
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_ep_axis=self.moe_ep_axis,
            fused_adaln=self.fused_adaln,
        )
        x = self._constrain(x)
        x = AdaLNBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            quantized=self.quantized,
            int8_attention=self.int8_attention,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            activation_sharding=self.activation_sharding,
            dtype=self.dtype,
            name="spatial",
            **moe_kw,
        )(x, c_spatial)

        # (b f) t d -> (b t) f d; under SP this relayout is the all-to-all
        x = x.reshape(B, F, T, D).transpose(0, 2, 1, 3).reshape(B * T, F, D)
        x = self._constrain(x)
        x = x + is_first.astype(x.dtype) * temp_embed

        x = AdaLNBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            quantized=self.quantized,
            int8_attention=self.int8_attention,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            activation_sharding=self.activation_sharding,
            dtype=self.dtype,
            name="temporal",
            **moe_kw,
        )(x, c_temp)

        # (b t) f d -> (b f) t d
        x = x.reshape(B, T, F, D).transpose(0, 2, 1, 3).reshape(B * F, T, D)
        x = self._constrain(x)
        if self.save_front_idx >= 0:
            saved = jnp.where(save_flag, x, saved)
            return (x, saved), None
        return x, None


class Latte(nn.Module):
    """Video DiT. Input (B, F, C, H, W), timesteps (B,) -> (B, F, C', H, W)
    with C' = 2C when ``learn_sigma`` (eps ‖ variance-interpolant).

    ``extras``: 1 = unconditional, 2 = class-conditional,
    78 = pooled-text-embedding conditioning (legacy CLIP path).
    """

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_frames: int = 16
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    extras: int = 1
    attention_mode: str = "auto"
    # attention_mode="ring": shard each attention's token axis over
    # ring_axis of ring_mesh (latte_tpu/dist/ring.py) — sequences past
    # one chip's HBM. The rest of the block is per-token, so XLA keeps
    # activations token-sharded between attention calls.
    ring_mesh: Optional[object] = None
    ring_axis: str = "sp"
    # W8A8 int8 serving for the hot block matmuls; params must come from
    # latte_tpu.quant.quantize_params (see latte_tpu/quant/int8.py)
    quantized: bool = False
    # also run the attention core int8 with calibrated per-head scales —
    # False | True/'full' (QKᵀ and P·V) | 'qk' (QKᵀ only). Requires
    # quantized="static" params produced from a calib model that ALSO had
    # int8_attention set (quant/int8.int8_attention)
    int8_attention: object = False
    # mesh axes to shard the fused batch·token leading dim over, e.g.
    # ("dp", "sp") — sequence parallelism; requires jitting under a Mesh
    activation_sharding: Optional[Tuple[str, ...]] = None
    # Mixture-of-Experts FF (models/moe.py): >1 swaps each block's dense
    # MLP for E expert MLPs + a top-k router; expert weights shard over
    # the mesh "ep" axis (moe_ep_axis) — expert parallelism
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    # Pallas-fused LN+modulate+gated-residual glue (kernels/adaln.py);
    # single-mesh only — see AdaLNBlock.fused_adaln
    fused_adaln: bool = False
    gradient_checkpointing: bool = False
    # remat policy when gradient_checkpointing: "full" | "dots"
    remat_policy: str = "full"
    unroll_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        text_embedding: Optional[jnp.ndarray] = None,
        train: bool = False,
        front_state: Optional[jnp.ndarray] = None,
        start_pair: int = 0,
        return_front: int = 0,
    ) -> jnp.ndarray:
        """Standard forward, plus the block-cache serving staging hooks
        (training-free DiT acceleration in the Δ-DiT / BlockDance family —
        front-of-stack features are structurally similar across adjacent
        diffusion timesteps, so a sampler may recompute them only every
        Nth step):

        - ``return_front=k`` (static, full forward): additionally return
          the activation after pair k — ``(out, front_k)``.
        - ``front_state=..., start_pair=k`` (static, partial forward): skip
          patchify/pos-embed and pairs 0..k-1, resuming the pair stack from
          the given activation. The caller slices the stacked ``blocks``
          params to ``[k:]`` (`latte_tpu/core/block_cache.py` does both).
        """
        if return_front and front_state is not None:
            raise ValueError("return_front and front_state are exclusive")
        if (front_state is None) != (start_pair == 0):
            raise ValueError("front_state and start_pair must be set together")
        B, F, C, H, W = x.shape
        in_dtype = x.dtype
        p = self.patch_size

        temp_embed = jnp.asarray(
            get_1d_sincos_pos_embed(self.hidden_size, F), dtype=self.dtype
        )[None]
        if front_state is None:
            x = x.reshape(B * F, C, H, W)
            x = PatchEmbed(
                patch_size=p,
                hidden_size=self.hidden_size,
                dtype=self.dtype,
                name="x_embedder",
            )(x)
            T = x.shape[1]

            pos_embed = jnp.asarray(
                get_2d_sincos_pos_embed(self.hidden_size, H // p), dtype=self.dtype
            )[None]
            x = x + pos_embed
        else:
            x = front_state
            T = x.shape[1]

        t_emb = TimestepEmbedder(
            hidden_size=self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t)
        # Conditioning broadcast: per-frame for spatial blocks, per-patch for
        # temporal blocks (reference `models/latte.py:333-343`).
        c_spatial = jnp.repeat(t_emb, F, axis=0)
        c_temp = jnp.repeat(t_emb, T, axis=0)

        if self.extras == 2:
            y_emb = LabelEmbedder(
                num_classes=self.num_classes,
                hidden_size=self.hidden_size,
                dropout_prob=self.class_dropout_prob,
                dtype=self.dtype,
                name="y_embedder",
            )(y, train=train)
            y_spatial = jnp.repeat(y_emb, F, axis=0)
            c_spatial = c_spatial + y_spatial
            c_temp = c_temp + jnp.repeat(y_emb, T, axis=0)
        elif self.extras == 78:
            txt = nn.Dense(
                self.hidden_size,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name="text_embedding_projection",
            )(nn.silu(text_embedding.reshape(B, -1).astype(self.dtype)))
            c_spatial = c_spatial + jnp.repeat(txt, F, axis=0)
            c_temp = c_temp + jnp.repeat(txt, T, axis=0)

        n_pairs = self.depth // 2 - start_pair
        pair_cls = SpatioTemporalPair
        if self.gradient_checkpointing:
            policy = _remat_policy(self.remat_policy)
            kw_remat = {"policy": policy} if policy is not None else {}
            pair_cls = nn.remat(pair_cls, prevent_cse=False, **kw_remat)
        PairScan = nn.scan(
            pair_cls,
            # "intermediates" carries the sown MoE aux losses; stacking it
            # on axis 0 gives one value per scanned pair (a no-op when the
            # caller doesn't apply with mutable=["intermediates"])
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
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            quantized=self.quantized,
            int8_attention=self.int8_attention,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            activation_sharding=self.activation_sharding,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_ep_axis=self.moe_ep_axis,
            fused_adaln=self.fused_adaln,
            save_front_idx=(return_front - 1) if return_front else -1,
            dtype=self.dtype,
            name="blocks",
        )(carry, (c_spatial, c_temp, temp_embed), flags)
        if return_front:
            x, front_saved = carry
        else:
            x = carry

        # Final layer conditioning: timestep (+ class) — the text path uses
        # timestep only (reference `models/latte.py:370-373`).
        c_final = c_spatial if self.extras == 2 else jnp.repeat(t_emb, F, axis=0)
        x = FinalLayer(
            hidden_size=self.hidden_size,
            patch_size=p,
            out_channels=self.out_channels,
            dtype=self.dtype,
            name="final_layer",
        )(x, c_final)
        x = unpatchify(x, p, self.out_channels)
        x = x.reshape(B, F, self.out_channels, H, W)
        out = x.astype(in_dtype)
        if return_front:
            return out, front_saved
        return out

    def forward_with_cfg(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cfg_scale: float = 7.0,
        text_embedding: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """CFG forward: batch is [cond | uncond]; guidance on the first 4
        (eps) channels only — reference quirk (`models/latte.py:379-398`)."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self.__call__(combined, t, y=y, text_embedding=text_embedding)
        eps, rest = model_out[:, :, :4], model_out[:, :, 4:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=2)
