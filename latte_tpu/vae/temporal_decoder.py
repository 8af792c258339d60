"""SVD temporal VAE decoder (AutoencoderKLTemporalDecoder's decoder) in Flax.

Fills the reference's `AutoencoderKLTemporalDecoder` dependency
(`/root/reference/sample/sample_t2x.py:31-34`, chunked decode of 14 frames
at `sample/pipeline_latte.py:785-792`): a spatial decoder whose resnet
blocks are blended with temporal (frame-axis) resnet blocks via learned
AlphaBlender mix factors, plus a final temporal conv over the output
frames — reducing flicker in decoded video.

Structure mirrors diffusers' TemporalDecoder (conv_in, mid block with
single-head attention, 4 up blocks × 3 spatio-temporal resnets,
time_conv_out) so pretrained weights map 1:1. Convs run NHWC internally.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from latte_tpu.vae.autoencoder_kl import AttnBlock, ResnetBlock, Upsample


class TemporalResnetBlock(nn.Module):
    """Resnet over the frame axis: (B, F, H, W, C) with (3,1,1) convs."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype, name="conv1",
        )(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype, name="conv2",
        )(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet + temporal resnet, blended by a learned alpha.

    ``switch_spatial_to_temporal_mix=True`` (the temporal-decoder setting):
    out = (1 - sigmoid(mix)) * spatial + sigmoid(mix) * temporal.
    """

    out_channels: int
    groups: int = 32
    merge_factor: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        BF, H, W, C = x.shape
        B = BF // num_frames
        h_spatial = ResnetBlock(
            self.out_channels, groups=self.groups, dtype=self.dtype,
            name="spatial_res_block",
        )(x)
        h = h_spatial.reshape(B, num_frames, H, W, self.out_channels)
        h_temporal = TemporalResnetBlock(
            self.out_channels, groups=self.groups, dtype=self.dtype,
            name="temporal_res_block",
        )(h)
        mix = self.param(
            "mix_factor", nn.initializers.constant(self.merge_factor), (1,)
        )
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))[0]
        out = (1.0 - alpha) * h + alpha * h_temporal
        return out.reshape(BF, H, W, self.out_channels)


class TemporalDecoder(nn.Module):
    """(B·F, C_lat, h, w) latents -> (B·F, 3, 8h, 8w) pixels."""

    in_channels: int = 4
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def decode_nhwc(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        ch = list(reversed(self.block_out_channels))  # 512,512,256,128
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = SpatioTemporalResBlock(
            ch[0], groups=self.groups, dtype=self.dtype, name="mid_resnet_0"
        )(h, num_frames)
        h = AttnBlock(ch[0], groups=self.groups, dtype=self.dtype, name="mid_attn")(h)
        h = SpatioTemporalResBlock(
            ch[0], groups=self.groups, dtype=self.dtype, name="mid_resnet_1"
        )(h, num_frames)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = SpatioTemporalResBlock(
                    c, groups=self.groups, dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(h, num_frames)
            if i != len(ch) - 1:
                h = Upsample(c, dtype=self.dtype, name=f"up_blocks_{i}_upsample")(h)
        h = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out"
        )(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        # final temporal conv over frames: (B, F, H, W, 3), kernel (3,1,1)
        BF, H, W, C = h.shape
        B = BF // num_frames
        hv = h.reshape(B, num_frames, H, W, C)
        hv = nn.Conv(
            self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype, name="time_conv_out",
        )(hv)
        return hv.reshape(BF, H, W, C)

    def decode(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        """NCHW public seam: (B·F, C_lat, h, w) -> (B·F, 3, H, W)."""
        h = z.transpose(0, 2, 3, 1)
        out = self.decode_nhwc(h, num_frames)
        return out.transpose(0, 3, 1, 2)

    def __call__(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        return self.decode(z, num_frames)


def tiny_temporal_decoder(**overrides) -> TemporalDecoder:
    cfg = dict(block_out_channels=(8, 16), layers_per_block=1, groups=4)
    cfg.update(overrides)
    return TemporalDecoder(**cfg)
