"""Stable-Diffusion AutoencoderKL (f8, KL-regularized) in Flax.

Fills the reference's external-VAE dependency (SURVEY.md §2.9: diffusers
`AutoencoderKL.from_pretrained(...)`, used with scaling 0.18215 at
`/root/reference/train.py:94,210` and `sample/sample.py:114`).

TPU-first notes:
- Convs run in NHWC (TPU-native layout); the public API keeps the
  reference's NCHW seam and transposes at the boundary.
- Module/param naming mirrors diffusers' AutoencoderKL tree
  (down_blocks/resnets/mid_block/...) so pretrained HF weights map 1:1 via
  `latte_tpu.tools.convert_vae`.
- GroupNorm and softmax run in fp32 even under bf16 compute.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DiagonalGaussianDistribution:
    """Posterior q(z|x) with diagonal covariance; moments (B, H, W, 2C)."""

    def __init__(self, moments: jnp.ndarray, axis: int = -1):
        self.mean, self.logvar = jnp.split(moments, 2, axis=axis)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over H·W tokens (VAE mid block)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="group_norm")(x)
        h2 = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h2)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h2)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h2)
        scale = C**-0.5
        logits = jnp.einsum(
            "bnc,bmc->bnm", (q * scale).astype(jnp.float32), k.astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnm,bmc->bnc", probs, v)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # SD uses asymmetric (0,1) padding before a stride-2 conv.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock(
                    c, groups=self.groups, dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(h)
            if i != len(ch) - 1:
                h = Downsample(c, dtype=self.dtype, name=f"down_blocks_{i}_downsample")(h)
        h = ResnetBlock(ch[-1], groups=self.groups, dtype=self.dtype, name="mid_resnet_0")(h)
        h = AttnBlock(ch[-1], groups=self.groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch[-1], groups=self.groups, dtype=self.dtype, name="mid_resnet_1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            2 * self.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        ch = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(ch[0], groups=self.groups, dtype=self.dtype, name="mid_resnet_0")(h)
        h = AttnBlock(ch[0], groups=self.groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch[0], groups=self.groups, dtype=self.dtype, name="mid_resnet_1")(h)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock(
                    c, groups=self.groups, dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(h)
            if i != len(ch) - 1:
                h = Upsample(c, dtype=self.dtype, name=f"up_blocks_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    """SD VAE. Public API in NCHW to match the reference seam.

    ``scaling_factor`` (0.18215) is exposed but NOT applied internally —
    callers multiply/divide exactly like the reference does.
    """

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    in_channels: int = 3
    groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            latent_channels=self.latent_channels,
            groups=self.groups,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            out_channels=self.in_channels,
            groups=self.groups,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Dense(2 * self.latent_channels, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.latent_channels, dtype=self.dtype)

    def encode(self, x: jnp.ndarray) -> DiagonalGaussianDistribution:
        """(B, 3, H, W) -> posterior over (B, C_lat, H/8, W/8)."""
        h = x.transpose(0, 2, 3, 1)
        moments = self.quant_conv(self.encoder(h))
        moments = moments.transpose(0, 3, 1, 2)  # NCHW out
        return DiagonalGaussianDistribution(moments, axis=1)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, C_lat, h, w) -> (B, 3, 8h, 8w)."""
        h = z.transpose(0, 2, 3, 1)
        out = self.decoder(self.post_quant_conv(h))
        return out.transpose(0, 3, 1, 2)

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        post = self.encode(x)
        z = post.sample(rng) if rng is not None else post.mode()
        return self.decode(z), post


def tiny_vae(**overrides) -> AutoencoderKL:
    """Small config for tests."""
    cfg = dict(block_out_channels=(8, 16), layers_per_block=1, groups=4)
    cfg.update(overrides)
    return AutoencoderKL(**cfg)
