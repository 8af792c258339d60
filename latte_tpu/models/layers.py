"""Transformer building blocks for the Latte DiT family (Flax).

Capability parity with `/root/reference/models/latte.py:28-201` but written
TPU-first: attention dispatches to either a pure-XLA path (fp32 softmax,
fully fusable) or the Pallas flash-attention kernel in
:mod:`latte_tpu.kernels.attention`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

xavier = nn.initializers.xavier_uniform
zeros = nn.initializers.zeros


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation; shift/scale are (B, D), x is (B, N, D)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class QDense(nn.Module):
    """Dense with an optional W8A8 int8 serving path.

    Floating-point mode declares the exact ``kernel``/``bias`` params of
    ``nn.Dense`` (checkpoints interchange freely). Quantized mode declares
    ``kernel_i8`` + ``kernel_scale`` as produced offline by
    :func:`latte_tpu.quant.quantize_params` and runs the matmul int8×int8
    on the MXU (2× the bf16 rate on v5e) with dynamic per-token
    activation quantization.
    """

    features: int
    use_bias: bool = True
    quantized: bool = False
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = xavier()
    bias_init: nn.initializers.Initializer = zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        if self.quantized == "train":
            # quantized TRAINING (QAT): fp32 master `kernel` (same param
            # as the fp path — checkpoints interchange), W8A8 forward with
            # straight-through backward (quant/int8.int8_matmul_ste)
            from latte_tpu.quant.int8 import int8_matmul_ste

            kernel = self.param(
                "kernel", self.kernel_init, (in_features, self.features), jnp.float32
            )
            y = int8_matmul_ste(jnp.asarray(x, self.dtype), kernel, self.dtype)
        elif self.quantized == "calib":
            # calibration pass: fp forward + record the activation amax into
            # the "calib" collection (apply with mutable=["calib"]); feeds
            # quantize_params(..., act_amax=...) for quantized="static"
            kernel = self.param(
                "kernel", self.kernel_init, (in_features, self.features), jnp.float32
            )
            self.sow(
                "calib",
                "act_amax",
                jnp.max(jnp.abs(x)).astype(jnp.float32),
                init_fn=lambda: jnp.float32(0.0),
                reduce_fn=jnp.maximum,
            )
            y = jnp.asarray(x, self.dtype) @ jnp.asarray(kernel, self.dtype)
        elif self.quantized == "static":
            # W8A8 with a CALIBRATED static activation scale: the quantize
            # fuses into the producer (no dynamic amax pass) — the serving
            # fast path (quant/int8.int8_matmul_static)
            from latte_tpu.quant.int8 import int8_matmul_static

            w_i8 = self.param(
                "kernel_i8", zeros, (in_features, self.features), jnp.int8
            )
            scale = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (1, self.features),
                jnp.float32,
            )
            act = self.param("act_scale", nn.initializers.ones, (), jnp.float32)
            y = int8_matmul_static(x, w_i8, scale, act, self.dtype)
        elif self.quantized:
            from latte_tpu.quant.int8 import int8_matmul

            w_i8 = self.param(
                "kernel_i8", zeros, (in_features, self.features), jnp.int8
            )
            scale = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (1, self.features),
                jnp.float32,
            )
            y = int8_matmul(x, w_i8, scale, self.dtype)
        else:
            kernel = self.param(
                "kernel", self.kernel_init, (in_features, self.features), jnp.float32
            )
            # same promotion semantics as nn.Dense(dtype=...): inputs and
            # kernel are both computed in self.dtype
            y = jnp.asarray(x, self.dtype) @ jnp.asarray(kernel, self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + jnp.asarray(bias, self.dtype)
        return y


class Mlp(nn.Module):
    """Transformer MLP: Dense -> gelu(tanh) -> Dense."""

    hidden_features: int
    out_features: int
    quantized: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = QDense(
            self.hidden_features,
            quantized=self.quantized,
            dtype=self.dtype,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=True)
        x = QDense(
            self.out_features,
            quantized=self.quantized,
            dtype=self.dtype,
            name="fc2",
        )(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with pluggable kernel backend.

    ``mode``:
      - "xla":   einsum attention, softmax in fp32 (XLA fuses the chain).
      - "flash": Pallas flash-attention kernel (long-sequence spatial path).
      - "auto":  flash when the sequence is long enough to profit, else xla.
      - "ring":  token axis sharded over ``ring_mesh``'s ``ring_axis``; K/V
        shards rotate over ICI (`latte_tpu.dist.ring`) — for sequences
        past one chip's HBM. Falls back to xla when the sequence length
        isn't divisible by the axis size (e.g. short temporal sequences).
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    mode: str = "auto"
    quantized: bool = False
    # int8 attention CORE (quant/int8.int8_attention): with
    # quantized="static", the attention matmuls also run int8×int8→int32
    # on the MXU using calibrated per-head q/k/v scales (sown here under
    # quantized="calib"). Values: False | True/"full" (QKᵀ AND P·V int8,
    # P·V at a per-row probability scale) | "qk" (QKᵀ int8 only; P·V stays
    # in the model dtype). Served by the fused-XLA core at short N and by
    # the Pallas int8 flash kernel (kernels/attention.flash_attention_int8)
    # at flash-routed N — only "ring" stays bf16 (a warning fires there).
    # Requires quantized="calib" (to sow scales) or "static" (to serve);
    # any other quantized value raises — the flag must never silently
    # serve bf16. The last floating-point compute category of the
    # static-W8A8 serving step (docs/tpu_notes.md round-4 conclusion).
    int8_attention: object = False
    ring_mesh: Optional[object] = None  # jax.sharding.Mesh (static field)
    ring_axis: str = "sp"
    flash_min_n: int = 512  # "auto" routes N >= this to the flash kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        # fused qkv with HEAD-MAJOR output layout (H, 3, hd): a tensor-
        # parallel column split of the output dim then lands on whole
        # heads (the torch converter permutes the reference's [q|k|v]
        # row order accordingly)
        qkv = QDense(
            self.dim * 3,
            use_bias=self.qkv_bias,
            quantized=self.quantized,
            dtype=self.dtype,
            name="qkv",
        )(x)
        qkv = qkv.reshape(B, N, self.num_heads, 3, head_dim)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]  # (B, N, H, hd)

        if self.int8_attention:
            if self.int8_attention not in (True, "full", "qk"):
                raise ValueError(
                    f"int8_attention={self.int8_attention!r}; expected False, "
                    "True/'full' (QKᵀ and P·V int8) or 'qk' (QKᵀ only)"
                )
            if self.quantized and self.quantized not in ("static", "calib"):
                # fail loud: with dynamic quantized=True (or QAT modes)
                # there are no calibrated scales, so the flag would silently
                # serve bf16 attention. quantized=False IS permitted here —
                # it is the transient state serving CLIs go through (build
                # the fp model, init/load params, then clone to "calib" /
                # "static"); the config-level guard that rejects *serving*
                # fp with the flag is models/registry.get_models.
                raise ValueError(
                    "int8_attention requires quantized='static' (serving, "
                    "with params from quantize_params(act_amax=...)) or "
                    "'calib' (the calibration pass); got "
                    f"quantized={self.quantized!r}"
                )
        if self.int8_attention and self.quantized == "static":
            # declared unconditionally (before the kernel dispatch below) so
            # the param tree is identical at every sequence length — a
            # flash-routed long-N call leaves them unused but present
            ones = nn.initializers.ones
            qkv_amax = tuple(
                self.param(nm, ones, (self.num_heads,), jnp.float32)
                for nm in ("q_scale", "k_scale", "v_scale")
            )
        if self.int8_attention and self.quantized == "calib":
            # per-head amax over (batch, tokens, head_dim) — feeds
            # quantize_params(..., act_amax=...) which turns each into a
            # {q,k,v}_scale param for the quantized="static" model
            for nm, arr in (("q_amax", q), ("k_amax", k), ("v_amax", v)):
                self.sow(
                    "calib",
                    nm,
                    jnp.max(jnp.abs(arr.astype(jnp.float32)), axis=(0, 1, 3)),
                    init_fn=lambda: jnp.zeros((self.num_heads,), jnp.float32),
                    reduce_fn=jnp.maximum,
                )

        mode = self.mode
        if mode == "auto":
            # Flash pays off once the N×N score tile stops fitting cache-
            # friendly XLA fusions: measured on-chip, XLA wins 6.6× at
            # N=256 (the 256² spatial shape) while flash wins 3× at
            # N=1024 (512²) — docs/tpu_notes.md "MFU roofline".
            mode = "flash" if N >= self.flash_min_n else "xla"

        if self.int8_attention and mode == "ring":
            # the ring kernel has no int8 core: tell the user the int8 flag
            # is being bypassed rather than silently serving bf16 (flash
            # DOES have one — kernels/attention.flash_attention_int8)
            import warnings

            warnings.warn(
                f"int8_attention: resolved attention mode {mode!r} at N={N} "
                "has no int8 core — this attention call runs bf16; use "
                "attention_mode='xla'/'flash' to keep int8 attention",
                stacklevel=2,
            )

        if mode == "ring":
            if self.ring_mesh is None:
                raise ValueError(
                    "attention_mode='ring' requires constructing the model "
                    "with ring_mesh=<jax.sharding.Mesh> (and the mesh must "
                    "name the ring_axis, default 'sp')"
                )
            if self.ring_axis not in self.ring_mesh.shape:
                raise ValueError(
                    f"ring_axis {self.ring_axis!r} not in mesh axes "
                    f"{tuple(self.ring_mesh.shape)}"
                )
            mode = "xla" if N % self.ring_mesh.shape[self.ring_axis] else "ring"
        if mode == "ring":
            from latte_tpu.dist.ring import ring_attention_sharded

            out = ring_attention_sharded(
                q, k, v, self.ring_mesh, self.ring_axis
            )  # (B, N, H, hd), token axis sharded over the ring
        elif mode == "flash" and self.int8_attention and self.quantized == "static":
            from latte_tpu.kernels.attention import flash_attention_int8

            out = flash_attention_int8(
                q,
                k,
                v,
                qkv_amax[0],
                qkv_amax[1],
                qkv_amax[2],
                self.dtype,
                pv_int8=(self.int8_attention != "qk"),
            )
        elif mode == "flash":
            from latte_tpu.kernels.attention import flash_attention

            out = flash_attention(q, k, v)  # (B, N, H, hd)
        elif mode == "xla" and self.int8_attention and self.quantized == "static":
            from latte_tpu.quant.int8 import int8_attention

            out = int8_attention(
                q,
                k,
                v,
                qkv_amax[0],
                qkv_amax[1],
                qkv_amax[2],
                self.dtype,
                pv_int8=(self.int8_attention != "qk"),
            )
        elif mode == "xla":
            # native-dtype matmul with fp32 accumulation: under bf16 the
            # inputs are already bf16, so an up-cast before the dot buys
            # no precision and runs the MXU at the fp32 rate (measured
            # 2.1× slower at N=256); softmax still reduces in fp32
            scale = head_dim**-0.5
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            probs = nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
        else:
            raise NotImplementedError(f"attention mode {self.mode}")

        out = out.reshape(B, N, C)
        return QDense(
            self.dim, quantized=self.quantized, dtype=self.dtype, name="proj"
        )(out)


class AdaLNBlock(nn.Module):
    """DiT transformer block with adaLN-Zero conditioning.

    The modulation MLP is zero-initialized so each block starts as identity
    (reference `models/latte.py:286-289`).
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    attention_mode: str = "auto"
    quantized: bool = False
    int8_attention: object = False  # False|True/'full'|'qk' — see Attention
    ring_mesh: Optional[object] = None
    ring_axis: str = "sp"
    activation_sharding: Optional[tuple] = None
    # Mixture-of-Experts FF (latte_tpu/models/moe.py): >1 replaces the
    # dense MLP with E expert MLPs + top-k router; weights shard over the
    # mesh "ep" axis (moe_ep_axis) for expert parallelism
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_ep_axis: Optional[str] = None
    # Fuse the LN + modulate + gated-residual glue into Pallas kernels
    # (kernels/adaln.py) — one HBM pass each instead of XLA's several
    # fusions. Single-mesh only: a pallas_call is opaque to GSPMD, so it
    # cannot compose with activation_sharding (sequence parallelism).
    fused_adaln: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        if self.fused_adaln and self.activation_sharding is not None:
            raise ValueError(
                "fused_adaln=True cannot compose with activation_sharding "
                "(a pallas_call is opaque to the SPMD partitioner); disable "
                "one of the two"
            )
        # W8A8 serving also quantizes this dense: its (D, 6D) weight streams
        # as many bytes per step as qkv+proj+fc1+fc2 combined once those are
        # int8, and the step is weight-DMA-bound (docs/tpu_notes.md). QAT
        # ("train") keeps it fp — it is zero-init-sensitive.
        mod = QDense(
            6 * self.hidden_size,
            quantized=(
                self.quantized
                if self.quantized in (True, "static", "calib")
                else False
            ),
            dtype=self.dtype,
            kernel_init=zeros,
            bias_init=zeros,
            name="adaLN_modulation",
        )(nn.silu(c))
        if self.activation_sharding is not None:
            # pin the (B·tokens, 6D) modulation to the batch-axis sharding
            # its consumers use: with the FSDP-sharded kernel, an
            # unconstrained output inherits the kernel's feature-dim dp
            # sharding, and GSPMD can only reach the consumers' batch
            # sharding by involuntary full rematerialization inside the
            # scan body. Constrained, the partitioner all-gathers the
            # weight instead — the standard FSDP schedule.
            import jax as _jax
            from jax.sharding import PartitionSpec as _P

            mod = _jax.lax.with_sharding_constraint(
                mod, _P(tuple(self.activation_sharding), None)
            )
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod, 6, axis=-1
        )
        attn = Attention(
            dim=self.hidden_size,
            num_heads=self.num_heads,
            qkv_bias=True,
            mode=self.attention_mode,
            quantized=self.quantized,
            int8_attention=self.int8_attention,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            dtype=self.dtype,
            name="attn",
        )
        if self.fused_adaln:
            from latte_tpu.kernels.adaln import ln_modulate, residual_ln_modulate

            attn_out = attn(ln_modulate(x, shift_msa, scale_msa))
            # y = x + gate_msa*attn_out (the residual carry) and the mlp
            # input LN(y)*(1+scale_mlp)+shift_mlp in one fused HBM pass
            x, ff_in = residual_ln_modulate(
                x, attn_out, gate_msa, shift_mlp, scale_mlp
            )
        else:
            # use_fast_variance=False: two-pass E[(x-mu)^2] variance — the
            # same formula as torch nn.LayerNorm AND kernels/adaln.py, so
            # the fused and unfused paths agree (flax's fast-variance
            # default diverges by ~3e-3 at large mean offsets)
            norm1 = nn.LayerNorm(
                epsilon=1e-6,
                use_bias=False,
                use_scale=False,
                use_fast_variance=False,
                dtype=self.dtype,
                name="norm1",
            )(x)
            x = x + gate_msa[:, None, :] * attn(
                modulate(norm1, shift_msa, scale_msa)
            )
            norm2 = nn.LayerNorm(
                epsilon=1e-6,
                use_bias=False,
                use_scale=False,
                use_fast_variance=False,
                dtype=self.dtype,
                name="norm2",
            )(x)
            ff_in = modulate(norm2, shift_mlp, scale_mlp)
        if self.moe_experts > 1:
            from latte_tpu.models.moe import MoEMlp

            if self.quantized:
                # no int8 path for the expert einsums yet — erroring beats
                # silently serving/QAT-training a full-precision FF that
                # diverges from the promised quantized arithmetic
                raise NotImplementedError(
                    "quantized (W8A8/QAT) + moe_experts is not supported: "
                    "MoEMlp has no int8 expert path"
                )
            ff = MoEMlp(
                hidden_features=int(self.hidden_size * self.mlp_ratio),
                out_features=self.hidden_size,
                num_experts=self.moe_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                ep_axis=self.moe_ep_axis,
                dtype=self.dtype,
                name="moe",
            )
        else:
            ff = Mlp(
                hidden_features=int(self.hidden_size * self.mlp_ratio),
                out_features=self.hidden_size,
                quantized=self.quantized,
                dtype=self.dtype,
                name="mlp",
            )
        x = x + gate_mlp[:, None, :] * ff(ff_in)
        return x


class FinalLayer(nn.Module):
    """adaLN-modulated zero-initialized output projection."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            2 * self.hidden_size,
            dtype=self.dtype,
            kernel_init=zeros,
            bias_init=zeros,
            name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(
            epsilon=1e-6,
            use_bias=False,
            use_scale=False,
            dtype=self.dtype,
            name="norm_final",
        )(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype,
            kernel_init=zeros,
            bias_init=zeros,
            name="linear",
        )(x)


class PatchEmbed(nn.Module):
    """Patchify as reshape + matmul (MXU-friendly; no conv needed).

    Equivalent to the reference's strided conv with the kernel flattened in
    (C, p, p) order — the torch->flax converter reshapes the conv weight
    accordingly.
    """

    patch_size: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, H, W) -> (B, H/p * W/p, D)."""
        B, C, H, W = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, f"input {H}x{W} not divisible by {p}"
        x = x.reshape(B, C, H // p, p, W // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, H/p, W/p, C, p, p)
        x = x.reshape(B, (H // p) * (W // p), C * p * p)
        return nn.Dense(
            self.hidden_size, dtype=self.dtype, kernel_init=xavier(), name="proj"
        )(x.astype(self.dtype))


def unpatchify(x: jnp.ndarray, patch_size: int, out_channels: int) -> jnp.ndarray:
    """(B, T, p²·C) -> (B, C, H, W) with T = (H/p)·(W/p), square grid."""
    B, T, _ = x.shape
    p, c = patch_size, out_channels
    h = w = int(round(T**0.5))
    assert h * w == T, "unpatchify expects a square token grid"
    x = x.reshape(B, h, w, p, p, c)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(B, c, h * p, w * p)
