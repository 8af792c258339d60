"""Minimal torch shim of the diffusers API surface `latte_t2v.py` imports.

The reference T2V model (`/root/reference/models/latte_t2v.py`) defines its
own temporal block, feed-forward, AdaLayerNormSingle and the whole
Transformer3D orchestration — but imports leaf building blocks from
diffusers, which this image does not ship.  This module implements exactly
those leaves with their standard published semantics (diffusers 0.24 /
PixArt-Alpha era), for the code paths the Latte config exercises:
``norm_type="ada_norm_single"``, patched continuous input, PEFT backend
(plain ``nn.Linear``), no LoRA, no gating, no additional conditions.

Like the timm shim in :mod:`reference_oracle`, this exists so the parity
tests can execute the reference model code itself.  Caveat for readers of
those tests: the *orchestration and temporal blocks* under test are genuine
reference code; the spatial `BasicTransformerBlock` below is our rendering
of diffusers' documented PixArt block, so the oracle is independent for the
former and semantics-faithful (but hand-written) for the latter.

Branches the Latte config never takes (`ada_norm`, `ada_norm_zero`,
vectorized input, sinusoidal positional embeddings) raise if reached.
"""

from __future__ import annotations

import functools
import inspect
import math
import sys
import types

import numpy as np

__all__ = ["install_diffusers_shim"]


def install_diffusers_shim() -> None:
    """Register `diffusers.*` shim modules in sys.modules (idempotent)."""
    if "diffusers.models.attention" in sys.modules:
        return
    try:  # pragma: no cover - image has no diffusers, but be polite
        import diffusers.models.attention  # noqa: F401

        return
    except ImportError:
        pass

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ---------------- utils ----------------
    USE_PEFT_BACKEND = True  # selects plain nn.Linear/Conv2d in the reference

    class BaseOutput:
        """dataclass base giving attribute + tuple-ish access."""

    def deprecate(*args, **kwargs):
        return None

    def maybe_allow_in_graph(cls):
        return cls

    class LoRACompatibleLinear(nn.Linear):
        pass

    class LoRACompatibleConv(nn.Conv2d):
        pass

    # ---------------- activations ----------------
    class GELU(nn.Module):
        def __init__(self, dim_in, dim_out, approximate="none", bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out, bias=bias)
            self.approximate = approximate

        def forward(self, x, *a):
            return F.gelu(self.proj(x), approximate=self.approximate)

    class GEGLU(nn.Module):
        def __init__(self, dim_in, dim_out, bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

        def forward(self, x, scale: float = 1.0):
            x, gate = self.proj(x).chunk(2, dim=-1)
            return x * F.gelu(gate)

    class ApproximateGELU(nn.Module):
        def __init__(self, dim_in, dim_out, bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out, bias=bias)

        def forward(self, x, *a):
            x = self.proj(x)
            return x * torch.sigmoid(1.702 * x)

    # ---------------- embeddings ----------------
    def get_1d_sincos_pos_embed_from_grid(embed_dim, pos):
        assert embed_dim % 2 == 0
        omega = np.arange(embed_dim // 2, dtype=np.float64)
        omega /= embed_dim / 2.0
        omega = 1.0 / 10000**omega
        pos = np.asarray(pos).reshape(-1)
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    def _get_2d_sincos_pos_embed(embed_dim, grid_size, base_size=16, interpolation_scale=1.0):
        grid_h = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / interpolation_scale
        grid_w = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / interpolation_scale
        grid = np.meshgrid(grid_w, grid_h)  # w first (MAE layout)
        grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
        emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
        emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
        return np.concatenate([emb_h, emb_w], axis=1)

    class PatchEmbed(nn.Module):
        """diffusers patch embedding: conv patchify + built-in 2D sincos."""

        def __init__(
            self,
            height=224,
            width=224,
            patch_size=16,
            in_channels=3,
            embed_dim=768,
            layer_norm=False,
            flatten=True,
            bias=True,
            interpolation_scale=1,
        ):
            super().__init__()
            self.flatten = flatten
            self.layer_norm = layer_norm
            self.patch_size = patch_size
            self.height, self.width = height // patch_size, width // patch_size
            self.base_size = height // patch_size
            self.interpolation_scale = interpolation_scale
            self.proj = nn.Conv2d(
                in_channels, embed_dim, kernel_size=patch_size, stride=patch_size, bias=bias
            )
            self.norm = nn.LayerNorm(embed_dim, eps=1e-6, elementwise_affine=False) if layer_norm else None
            pos = _get_2d_sincos_pos_embed(
                embed_dim, int((height // patch_size)), base_size=self.base_size,
                interpolation_scale=self.interpolation_scale,
            )
            self.register_buffer(
                "pos_embed", torch.from_numpy(pos).float().unsqueeze(0), persistent=False
            )

        def forward(self, latent):
            height = latent.shape[-2] // self.patch_size
            width = latent.shape[-1] // self.patch_size
            latent = self.proj(latent)
            if self.flatten:
                latent = latent.flatten(2).transpose(1, 2)
            if self.norm is not None:
                latent = self.norm(latent)
            if self.height != height or self.width != width:
                pos = _get_2d_sincos_pos_embed(
                    self.pos_embed.shape[-1], height,
                    base_size=self.base_size, interpolation_scale=self.interpolation_scale,
                )
                pos = torch.from_numpy(pos).float().unsqueeze(0).to(latent.device)
            else:
                pos = self.pos_embed
            return (latent + pos).to(latent.dtype)

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos=True, downscale_freq_shift=0.0):
            super().__init__()
            self.num_channels = num_channels
            self.flip_sin_to_cos = flip_sin_to_cos
            self.downscale_freq_shift = downscale_freq_shift

        def forward(self, timesteps):
            half = self.num_channels // 2
            exponent = -math.log(10000) * torch.arange(
                half, dtype=torch.float32, device=timesteps.device
            )
            exponent = exponent / (half - self.downscale_freq_shift)
            emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
            emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
            if self.flip_sin_to_cos:
                emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
            return emb

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

        def forward(self, sample):
            return self.linear_2(self.act(self.linear_1(sample)))

    class CombinedTimestepSizeEmbeddings(nn.Module):
        """PixArt timestep (+ optional resolution/aspect) conditioning."""

        def __init__(self, embedding_dim, size_emb_dim, use_additional_conditions=False):
            super().__init__()
            assert not use_additional_conditions, "additional conditions not shimmed"
            self.time_proj = Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)
            self.timestep_embedder = TimestepEmbedding(256, embedding_dim)

        def forward(self, timestep, resolution=None, aspect_ratio=None, batch_size=None, hidden_dtype=None):
            proj = self.time_proj(timestep)
            return self.timestep_embedder(proj.to(dtype=hidden_dtype))

    class CaptionProjection(nn.Module):
        def __init__(self, in_features, hidden_size, num_tokens=120):
            super().__init__()
            self.linear_1 = nn.Linear(in_features, hidden_size)
            self.act_1 = nn.GELU(approximate="tanh")
            self.linear_2 = nn.Linear(hidden_size, hidden_size)
            self.register_buffer(
                "y_embedding",
                torch.randn(num_tokens, in_features) / in_features**0.5,
                persistent=True,
            )

        def forward(self, caption, force_drop_ids=None):
            return self.linear_2(self.act_1(self.linear_1(caption)))

    class ImagePositionalEmbeddings(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()
            raise NotImplementedError("vectorized input not shimmed")

    class SinusoidalPositionalEmbedding(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()
            raise NotImplementedError("sinusoidal positional embeddings not shimmed")

    # ---------------- normalization (unused branches) ----------------
    class AdaLayerNorm(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()
            raise NotImplementedError("ada_norm branch not shimmed")

    class AdaLayerNormZero(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()
            raise NotImplementedError("ada_norm_zero branch not shimmed")

    # ---------------- attention ----------------
    class Attention(nn.Module):
        """Standard multi-head attention with diffusers' module naming."""

        def __init__(
            self,
            query_dim,
            cross_attention_dim=None,
            heads=8,
            dim_head=64,
            dropout=0.0,
            bias=False,
            upcast_attention=False,
            out_bias=True,
            **kwargs,
        ):
            super().__init__()
            inner = heads * dim_head
            self.heads = heads
            self.scale = dim_head**-0.5
            self.upcast_attention = upcast_attention
            kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(kv_dim, inner, bias=bias)
            self.to_v = nn.Linear(kv_dim, inner, bias=bias)
            self.to_out = nn.ModuleList([nn.Linear(inner, query_dim, bias=out_bias), nn.Dropout(dropout)])

        def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None, **kwargs):
            ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
            B, N, _ = hidden_states.shape
            M = ctx.shape[1]
            h = self.heads
            q = self.to_q(hidden_states).view(B, N, h, -1).transpose(1, 2)
            k = self.to_k(ctx).view(B, M, h, -1).transpose(1, 2)
            v = self.to_v(ctx).view(B, M, h, -1).transpose(1, 2)
            if self.upcast_attention:
                q, k = q.float(), k.float()
            scores = torch.matmul(q, k.transpose(-1, -2)) * self.scale
            if attention_mask is not None:
                # additive bias (B, 1, M) or (B, q, M): broadcast over heads
                scores = scores + attention_mask.unsqueeze(1).to(scores.dtype)
            probs = scores.softmax(dim=-1).to(v.dtype)
            out = torch.matmul(probs, v)
            out = out.transpose(1, 2).reshape(B, N, -1)
            out = self.to_out[0](out)
            return self.to_out[1](out)

    class FeedForward(nn.Module):
        """diffusers FeedForward (same net.{0,1,2} naming the converters use)."""

        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0, activation_fn="geglu", final_dropout=False):
            super().__init__()
            inner_dim = int(dim * mult)
            dim_out = dim_out or dim
            if activation_fn == "gelu":
                act = GELU(dim, inner_dim)
            elif activation_fn == "gelu-approximate":
                act = GELU(dim, inner_dim, approximate="tanh")
            elif activation_fn == "geglu":
                act = GEGLU(dim, inner_dim)
            elif activation_fn == "geglu-approximate":
                act = ApproximateGELU(dim, inner_dim)
            else:
                raise NotImplementedError(activation_fn)
            self.net = nn.ModuleList([act, nn.Dropout(dropout), nn.Linear(inner_dim, dim_out)])
            if final_dropout:
                self.net.append(nn.Dropout(dropout))

        def forward(self, hidden_states, scale: float = 1.0):
            for module in self.net:
                hidden_states = module(hidden_states)
            return hidden_states

    # ---------------- the PixArt spatial block ----------------
    class BasicTransformerBlock(nn.Module):
        """diffusers' block, ada_norm_single (PixArt) code path only."""

        def __init__(
            self,
            dim,
            num_attention_heads,
            attention_head_dim,
            dropout=0.0,
            cross_attention_dim=None,
            activation_fn="geglu",
            num_embeds_ada_norm=None,
            attention_bias=False,
            only_cross_attention=False,
            double_self_attention=False,
            upcast_attention=False,
            norm_elementwise_affine=True,
            norm_type="layer_norm",
            norm_eps=1e-5,
            final_dropout=False,
            attention_type="default",
            positional_embeddings=None,
            num_positional_embeddings=None,
        ):
            super().__init__()
            if norm_type != "ada_norm_single":
                raise NotImplementedError(f"shim covers ada_norm_single only, got {norm_type!r}")
            assert not only_cross_attention and not double_self_attention
            assert attention_type == "default" and positional_embeddings is None
            self.only_cross_attention = only_cross_attention
            self.use_ada_layer_norm_single = True

            self.norm1 = nn.LayerNorm(dim, elementwise_affine=norm_elementwise_affine, eps=norm_eps)
            self.attn1 = Attention(
                query_dim=dim,
                heads=num_attention_heads,
                dim_head=attention_head_dim,
                dropout=dropout,
                bias=attention_bias,
                cross_attention_dim=None,
                upcast_attention=upcast_attention,
            )
            if cross_attention_dim is not None:
                self.norm2 = nn.LayerNorm(dim, elementwise_affine=norm_elementwise_affine, eps=norm_eps)
                self.attn2 = Attention(
                    query_dim=dim,
                    cross_attention_dim=cross_attention_dim,
                    heads=num_attention_heads,
                    dim_head=attention_head_dim,
                    dropout=dropout,
                    bias=attention_bias,
                    upcast_attention=upcast_attention,
                )
            else:
                self.norm2 = None
                self.attn2 = None
            self.ff = FeedForward(
                dim, dropout=dropout, activation_fn=activation_fn, final_dropout=final_dropout
            )
            self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)
            self._chunk_size = None
            self._chunk_dim = 0

        def set_chunk_feed_forward(self, chunk_size, dim):
            self._chunk_size = chunk_size
            self._chunk_dim = dim

        def forward(
            self,
            hidden_states,
            attention_mask=None,
            encoder_hidden_states=None,
            encoder_attention_mask=None,
            timestep=None,
            cross_attention_kwargs=None,
            class_labels=None,
        ):
            B = hidden_states.shape[0]
            shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
                self.scale_shift_table[None] + timestep.reshape(B, 6, -1)
            ).chunk(6, dim=1)
            norm_hidden = self.norm1(hidden_states)
            norm_hidden = norm_hidden * (1 + scale_msa) + shift_msa
            attn_out = self.attn1(norm_hidden, attention_mask=attention_mask)
            hidden_states = hidden_states + gate_msa * attn_out
            if self.attn2 is not None:
                # PixArt: no pre-norm before cross attention
                attn_out = self.attn2(
                    hidden_states,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=encoder_attention_mask,
                )
                hidden_states = hidden_states + attn_out
            norm_hidden = self.norm2(hidden_states)
            norm_hidden = norm_hidden * (1 + scale_mlp) + shift_mlp
            if self._chunk_size is not None:
                n = norm_hidden.shape[self._chunk_dim] // self._chunk_size
                ff_out = torch.cat(
                    [self.ff(c) for c in norm_hidden.chunk(n, dim=self._chunk_dim)],
                    dim=self._chunk_dim,
                )
            else:
                ff_out = self.ff(norm_hidden)
            return hidden_states + gate_mlp * ff_out

    # ---------------- config plumbing ----------------
    class ModelMixin(nn.Module):
        pass

    class ConfigMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            object.__setattr__(self, "config", types.SimpleNamespace(**cfg))
            init(self, *args, **kwargs)

        return wrapper

    class Transformer2DModel(nn.Module):  # imported but unused by latte_t2v
        pass

    # ---------------- module registration ----------------
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    diffusers = mod("diffusers")
    models = mod("diffusers.models", Transformer2DModel=Transformer2DModel)
    diffusers.models = models
    utils = mod(
        "diffusers.utils",
        USE_PEFT_BACKEND=USE_PEFT_BACKEND,
        BaseOutput=BaseOutput,
        deprecate=deprecate,
    )
    diffusers.utils = utils
    mod(
        "diffusers.models.embeddings",
        get_1d_sincos_pos_embed_from_grid=get_1d_sincos_pos_embed_from_grid,
        ImagePositionalEmbeddings=ImagePositionalEmbeddings,
        CaptionProjection=CaptionProjection,
        PatchEmbed=PatchEmbed,
        CombinedTimestepSizeEmbeddings=CombinedTimestepSizeEmbeddings,
        SinusoidalPositionalEmbedding=SinusoidalPositionalEmbedding,
        Timesteps=Timesteps,
        TimestepEmbedding=TimestepEmbedding,
    )
    mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin,
        register_to_config=register_to_config,
    )
    mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    mod("diffusers.models.attention", BasicTransformerBlock=BasicTransformerBlock)
    mod(
        "diffusers.models.lora",
        LoRACompatibleConv=LoRACompatibleConv,
        LoRACompatibleLinear=LoRACompatibleLinear,
    )
    mod("diffusers.utils.torch_utils", maybe_allow_in_graph=maybe_allow_in_graph)
    mod(
        "diffusers.models.normalization",
        AdaLayerNorm=AdaLayerNorm,
        AdaLayerNormZero=AdaLayerNormZero,
    )
    mod("diffusers.models.attention_processor", Attention=Attention)
    mod(
        "diffusers.models.activations",
        GEGLU=GEGLU,
        GELU=GELU,
        ApproximateGELU=ApproximateGELU,
    )
