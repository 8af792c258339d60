"""LatteIMG: joint video–image DiT variant (Flax).

Capability parity with `/root/reference/models/latte_img.py:207-421`: the
input's frame axis carries ``num_frames`` video frames followed by
``use_image_num`` independent still images. Spatial blocks attend over all
frames (video + images folded into batch); temporal blocks run only on the
video frames, with the still-image tokens passed through untouched.
Class-conditional training uses per-image labels ``y_image``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

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

class JointSpatioTemporalPair(nn.Module):
    """Scanned (spatial, temporal) pair; temporal attends video frames only."""

    hidden_size: int
    num_heads: int
    num_video_frames: int
    mlp_ratio: float = 4.0
    attention_mode: str = "auto"
    quantized: bool = False
    int8_attention: object = False  # False|True|'full'|'qk' — see layers.Attention
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        is_first: jnp.ndarray,
    ):
        c_spatial, c_temp, temp_embed = cond
        Fv = self.num_video_frames
        BF, T, D = x.shape

        moe_kw = dict(
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_ep_axis=self.moe_ep_axis,
        )
        x = AdaLNBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            quantized=self.quantized,
            int8_attention=self.int8_attention,
            dtype=self.dtype,
            name="spatial",
            **moe_kw,
        )(x, c_spatial)

        B = c_temp.shape[0] // T
        Ftot = BF // B
        # (b f) t d -> (b t) f d; split video/image frames
        x = x.reshape(B, Ftot, T, D).transpose(0, 2, 1, 3).reshape(B * T, Ftot, D)
        x_video, x_image = x[:, :Fv], x[:, Fv:]
        x_video = x_video + is_first.astype(x.dtype) * temp_embed

        x_video = AdaLNBlock(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            quantized=self.quantized,
            int8_attention=self.int8_attention,
            dtype=self.dtype,
            name="temporal",
            **moe_kw,
        )(x_video, c_temp)

        x = jnp.concatenate([x_video, x_image], axis=1)
        x = x.reshape(B, T, Ftot, D).transpose(0, 2, 1, 3).reshape(B * Ftot, T, D)
        return x, None


class LatteIMG(nn.Module):
    """Joint video+image Latte. Input (B, F+I, C, H, W) where I still images
    follow the F video frames; output (B, F+I, C', H, W)."""

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
    use_image_num: int = 0
    attention_mode: str = "auto"
    # W8A8 int8 serving (latte_tpu/quant)
    quantized: bool = False
    # int8 attention core with calibrated per-head scales (see models/dit.py)
    int8_attention: object = False  # False|True|'full'|'qk' — see layers.Attention
    # Mixture-of-Experts FF (models/moe.py); weights shard over the mesh
    # "ep" axis (moe_ep_axis) — expert parallelism
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
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        y_image: Optional[jnp.ndarray] = None,
        text_embedding: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        B, Ftot, C, H, W = x.shape
        in_dtype = x.dtype
        p = self.patch_size
        Fv = Ftot - (self.use_image_num if train else 0)

        x = x.reshape(B * Ftot, C, H, W)
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
        temp_embed = jnp.asarray(
            get_1d_sincos_pos_embed(self.hidden_size, Fv), dtype=self.dtype
        )[None]
        x = x + pos_embed

        t_emb = TimestepEmbedder(
            hidden_size=self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t)
        c_spatial = jnp.repeat(t_emb, Ftot, axis=0)
        c_temp = jnp.repeat(t_emb, T, axis=0)

        if self.extras == 2:
            y_embedder = LabelEmbedder(
                num_classes=self.num_classes,
                hidden_size=self.hidden_size,
                dropout_prob=self.class_dropout_prob,
                dtype=self.dtype,
                name="y_embedder",
            )
            y_emb = y_embedder(y, train=train)  # (B, D)
            if train and self.use_image_num > 0:
                y_img_emb = y_embedder(y_image, train=train)  # (B, I, D)
                y_spatial = jnp.concatenate(
                    [jnp.repeat(y_emb[:, None, :], Fv, axis=1), y_img_emb], axis=1
                ).reshape(B * Ftot, -1)
            else:
                y_spatial = jnp.repeat(y_emb, Ftot, axis=0)
            c_spatial = c_spatial + y_spatial
            c_temp = c_temp + jnp.repeat(y_emb, T, axis=0)
        elif self.extras == 78:
            # per-frame text conditioning (reference `latte_img.py:351-359`):
            # text_embedding (B, 1+I, D_txt) — row 0 conditions all video
            # frames, rows 1..I the joint still images
            txt = nn.Dense(
                self.hidden_size,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name="text_embedding_projection",
            )(nn.silu(text_embedding.astype(self.dtype)))
            txt_video = jnp.repeat(txt[:, :1], Fv, axis=1)
            txt_spatial = jnp.concatenate([txt_video, txt[:, 1:]], axis=1)
            c_spatial = c_spatial + txt_spatial.reshape(B * Ftot, -1)
            c_temp = c_temp + jnp.repeat(
                txt[:, 0], T, axis=0
            )

        n_pairs = self.depth // 2
        pair_cls = JointSpatioTemporalPair
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
        is_first = (jnp.arange(n_pairs) == 0).astype(self.dtype).reshape(n_pairs, 1, 1, 1)
        x, _ = PairScan(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            num_video_frames=Fv,
            mlp_ratio=self.mlp_ratio,
            attention_mode=self.attention_mode,
            quantized=self.quantized,
            int8_attention=self.int8_attention,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_ep_axis=self.moe_ep_axis,
            dtype=self.dtype,
            name="blocks",
        )(x, (c_spatial, c_temp, temp_embed), is_first)

        c_final = c_spatial
        x = FinalLayer(
            hidden_size=self.hidden_size,
            patch_size=p,
            out_channels=self.out_channels,
            dtype=self.dtype,
            name="final_layer",
        )(x, c_final)
        x = unpatchify(x, p, self.out_channels)
        x = x.reshape(B, Ftot, self.out_channels, H, W)
        return x.astype(in_dtype)

    def forward_with_cfg(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cfg_scale: float = 7.0,
    ) -> jnp.ndarray:
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self.__call__(combined, t, y=y)
        eps, rest = model_out[:, :, :4], model_out[:, :, 4:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=2)
