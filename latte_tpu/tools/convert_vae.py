"""Convert diffusers AutoencoderKL weights -> latte_tpu Flax VAE params.

Covers the three VAE variants the reference loads (SURVEY.md §2.9):
``vae``, ``sd-vae-ft-mse``, ``sd-vae-ft-ema`` — all share the diffusers
AutoencoderKL parameter naming.  Layout changes:

- conv weight (O, I, kh, kw)  ->  flax Conv kernel (kh, kw, I, O)
- 1x1 convs (quant/post_quant, legacy attention q/k/v) -> Dense (I, O)
- attention to_q/to_k/to_v/to_out accept both Linear and legacy-1x1 forms
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = ["convert_vae_state_dict", "convert_temporal_decoder_state_dict"]


def _conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _dense_from_any(sd, prefix):
    """Linear (O, I) or 1x1-conv (O, I, 1, 1) -> Dense kernel (I, O)."""
    w = np.asarray(sd[f"{prefix}.weight"])
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _resnet(sd, prefix):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    return out


def _attn(sd, prefix):
    # diffusers >=0.18 uses to_q/..., older uses query/key/value/proj_attn
    names = (
        ("to_q", "to_k", "to_v", "to_out.0")
        if f"{prefix}.to_q.weight" in sd
        else ("query", "key", "value", "proj_attn")
    )
    return {
        "group_norm": _norm(sd, f"{prefix}.group_norm"),
        "to_q": _dense_from_any(sd, f"{prefix}.{names[0]}"),
        "to_k": _dense_from_any(sd, f"{prefix}.{names[1]}"),
        "to_v": _dense_from_any(sd, f"{prefix}.{names[2]}"),
        "to_out": _dense_from_any(sd, f"{prefix}.{names[3]}"),
    }


def _coder(sd: Mapping[str, Any], side: str, n_blocks: int, layers: int) -> Dict:
    """Shared encoder/decoder mapping. ``side`` in {"encoder", "decoder"};
    decoder resnet count per block is layers+1."""
    per_block = layers if side == "encoder" else layers + 1
    sampler = "downsamplers" if side == "encoder" else "upsamplers"
    block_kind = "down_blocks" if side == "encoder" else "up_blocks"
    out: Dict[str, Any] = {
        "conv_in": _conv(sd, f"{side}.conv_in"),
        "mid_resnet_0": _resnet(sd, f"{side}.mid_block.resnets.0"),
        "mid_attn": _attn(sd, f"{side}.mid_block.attentions.0"),
        "mid_resnet_1": _resnet(sd, f"{side}.mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, f"{side}.conv_norm_out"),
        "conv_out": _conv(sd, f"{side}.conv_out"),
    }
    local_kind = "down_blocks" if side == "encoder" else "up_blocks"
    for i in range(n_blocks):
        for j in range(per_block):
            out[f"{local_kind}_{i}_resnets_{j}"] = _resnet(
                sd, f"{side}.{block_kind}.{i}.resnets.{j}"
            )
        samp_key = f"{side}.{block_kind}.{i}.{sampler}.0.conv.weight"
        if samp_key in sd:
            name = (
                f"{local_kind}_{i}_downsample"
                if side == "encoder"
                else f"{local_kind}_{i}_upsample"
            )
            out[name] = {"conv": _conv(sd, f"{side}.{block_kind}.{i}.{sampler}.0.conv")}
    return out


def convert_vae_state_dict(
    sd: Mapping[str, Any], n_blocks: int = 4, layers_per_block: int = 2
) -> Dict[str, Any]:
    """Full AutoencoderKL state dict -> Flax params tree."""
    sd = {
        k: np.asarray(
            getattr(v, "detach", lambda: v)().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in sd.items()
    }
    return {
        "encoder": _coder(sd, "encoder", n_blocks, layers_per_block),
        "decoder": _coder(sd, "decoder", n_blocks, layers_per_block),
        "quant_conv": _dense_from_any(sd, "quant_conv"),
        "post_quant_conv": _dense_from_any(sd, "post_quant_conv"),
    }


def _conv3d(sd, prefix):
    """torch (O, I, kt, kh, kw) -> flax Conv kernel (kt, kh, kw, I, O)."""
    w = np.asarray(sd[f"{prefix}.weight"])
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _temporal_resnet(sd, prefix):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv3d(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv3d(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv3d(sd, f"{prefix}.conv_shortcut")
    return out


def _st_resnet(sd, prefix):
    """diffusers SpatioTemporalResBlock -> our SpatioTemporalResBlock tree."""
    return {
        "spatial_res_block": _resnet(sd, f"{prefix}.spatial_res_block"),
        "temporal_res_block": _temporal_resnet(sd, f"{prefix}.temporal_res_block"),
        "mix_factor": np.asarray(sd[f"{prefix}.time_mixer.mix_factor"]).reshape(1),
    }


def convert_temporal_decoder_state_dict(
    sd: Mapping[str, Any], n_blocks: int = 4, layers_per_block: int = 3
) -> Dict[str, Any]:
    """diffusers AutoencoderKLTemporalDecoder decoder weights -> our
    :class:`latte_tpu.vae.temporal_decoder.TemporalDecoder` params."""
    sd = {
        k: np.asarray(
            getattr(v, "detach", lambda: v)().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in sd.items()
    }
    # accept either "decoder."-prefixed (full AutoencoderKL state) or bare
    if any(k.startswith("decoder.") for k in sd):
        sd = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
    out: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "mid_resnet_0": _st_resnet(sd, "mid_block.resnets.0"),
        "mid_attn": _attn(sd, "mid_block.attentions.0"),
        "mid_resnet_1": _st_resnet(sd, "mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "time_conv_out": _conv3d(sd, "time_conv_out"),
    }
    for i in range(n_blocks):
        for j in range(layers_per_block):
            out[f"up_blocks_{i}_resnets_{j}"] = _st_resnet(
                sd, f"up_blocks.{i}.resnets.{j}"
            )
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            out[f"up_blocks_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
            }
    return out


def _load_torch_weights(path: str) -> Dict[str, Any]:
    """Read a diffusers weights file — or a diffusers model directory
    (picks `diffusion_pytorch_model.{safetensors,bin}`)."""
    import os

    if os.path.isdir(path):
        for name in (
            "diffusion_pytorch_model.safetensors",
            "diffusion_pytorch_model.bin",
        ):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(
                f"no diffusers weights file under {path!r}"
            )
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def cli():
    """`python -m latte_tpu.tools.convert_vae SRC DST` — diffusers
    AutoencoderKL (or, with --temporal-decoder, the
    AutoencoderKLTemporalDecoder decoder) -> an orbax directory usable as
    the `vae_ckpt:` / temporal-decoder checkpoint in configs."""
    import argparse
    import os

    p = argparse.ArgumentParser(description=cli.__doc__)
    p.add_argument("src", help="diffusers model dir or weights file")
    p.add_argument("dst", help="output orbax checkpoint directory")
    p.add_argument(
        "--temporal-decoder",
        action="store_true",
        help="convert an AutoencoderKLTemporalDecoder decoder instead",
    )
    p.add_argument("--n-blocks", type=int, default=4)
    p.add_argument(
        "--layers-per-block",
        type=int,
        default=None,
        help="default: 2 (AutoencoderKL) / 3 (temporal decoder)",
    )
    a = p.parse_args()
    lpb = a.layers_per_block or (3 if a.temporal_decoder else 2)
    sd = _load_torch_weights(a.src)
    params = (
        convert_temporal_decoder_state_dict(sd, a.n_blocks, lpb)
        if a.temporal_decoder
        else convert_vae_state_dict(sd, a.n_blocks, lpb)
    )
    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(os.path.abspath(a.dst), params)
    n = sum(1 for _ in _iter_leaves(params))
    print(f"wrote {a.dst} ({n} arrays)")


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    cli()
