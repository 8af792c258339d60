"""Checkpoint conversion: reference PyTorch Latte weights -> Flax params.

The reference publishes `.pt` files shaped ``{"model": state_dict, "ema":
state_dict}`` (`/root/reference/utils.py:274-287` prefers "ema").  This
module maps those flat ``blocks.N.attn.qkv.weight``-style keys onto our
scanned-module parameter tree:

- torch ``nn.Linear`` weight (out, in)  ->  flax Dense kernel (in, out): T
- patch-embed conv (D, C, p, p)         ->  Dense kernel (C*p*p, D)
  (our PatchEmbed flattens patches in (C, p, p) order — see
  `latte_tpu/models/layers.py:PatchEmbed`)
- per-block params for block 2i / 2i+1  ->  stacked [n_pairs, ...] arrays
  under blocks/spatial and blocks/temporal (nn.scan layout)
- frozen sincos buffers (pos_embed/temp_embed) are dropped — we recompute.

Works on numpy arrays so the core mapping has no torch dependency;
`load_torch_checkpoint` handles the actual `.pt` IO when torch is present.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "convert_latte_state_dict",
    "load_torch_checkpoint",
    "flax_to_reference_state_dict",
]


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight -> flax Dense kernel."""
    return np.ascontiguousarray(w.T)


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _qkv_linear(sd: Mapping[str, np.ndarray], prefix: str, num_heads: int) -> Dict[str, np.ndarray]:
    """Fused qkv with row order [q|k|v] -> head-major (H, 3, hd) layout
    (our Attention's TP-friendly output ordering)."""
    w = np.asarray(sd[f"{prefix}.weight"])  # (3D, D)
    three_d, d = w.shape
    hd = d // num_heads
    w = w.reshape(3, num_heads, hd, d).transpose(3, 1, 0, 2).reshape(d, three_d)
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        b = np.asarray(sd[f"{prefix}.bias"]).reshape(3, num_heads, hd)
        out["bias"] = np.ascontiguousarray(b.transpose(1, 0, 2).reshape(-1))
    return out


def _adaln_block(
    sd: Mapping[str, np.ndarray], prefix: str, num_heads: int
) -> Dict[str, Any]:
    """One reference TransformerBlock -> our AdaLNBlock param subtree."""
    return {
        "attn": {
            "qkv": _qkv_linear(sd, f"{prefix}.attn.qkv", num_heads),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
        # reference wraps the modulation Dense in Sequential(SiLU, Linear)
        "adaLN_modulation": _linear(sd, f"{prefix}.adaLN_modulation.1"),
    }


def _stack(blocks) -> Any:
    """Stack a list of identical param subtrees along a new leading axis."""
    if isinstance(blocks[0], dict):
        return {k: _stack([b[k] for b in blocks]) for k in blocks[0]}
    return np.stack(blocks, axis=0)


#: state_dict keys that are frozen buffers the Flax models recompute —
#: legitimately not converted (`/root/reference/models/latte.py:246-247`).
_FROZEN_BUFFERS = ("pos_embed", "temp_embed")


class _TrackingDict(dict):
    """Records which keys were actually consumed via ``[]`` so the converter
    can refuse checkpoints containing weights it would silently drop."""

    def __init__(self, d):
        super().__init__(d)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def convert_latte_state_dict(
    sd: Mapping[str, Any], depth: int, num_heads: int = 16, strict: bool = True
) -> Dict[str, Any]:
    """Convert a reference Latte/LatteIMG state_dict to our Flax params tree.

    ``sd`` values may be torch tensors or numpy arrays.  With ``strict``
    (the default), raises if the checkpoint contains weight keys the mapping
    does not consume (beyond the frozen sincos buffers) — a real published
    checkpoint with unexpected extra layers must fail loudly, not convert
    to a silently-lobotomized model.
    """
    sd = _TrackingDict(
        {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                       if hasattr(v, "detach") else v)
         for k, v in sd.items()})

    params: Dict[str, Any] = {}

    # Patch embed: conv (D, C, p, p) -> Dense kernel (C*p*p, D).
    w = sd["x_embedder.proj.weight"]
    params["x_embedder"] = {
        "proj": {
            "kernel": _t(w.reshape(w.shape[0], -1)),
            "bias": sd["x_embedder.proj.bias"],
        }
    }
    params["t_embedder"] = {
        "mlp_0": _linear(sd, "t_embedder.mlp.0"),
        "mlp_2": _linear(sd, "t_embedder.mlp.2"),
    }
    if "y_embedder.embedding_table.weight" in sd:
        params["y_embedder"] = {
            "embedding_table": sd["y_embedder.embedding_table.weight"]
        }
    if "text_embedding_projection.1.weight" in sd:
        params["text_embedding_projection"] = _linear(
            sd, "text_embedding_projection.1"
        )

    n_pairs = depth // 2
    spatial = [
        _adaln_block(sd, f"blocks.{2 * i}", num_heads) for i in range(n_pairs)
    ]
    temporal = [
        _adaln_block(sd, f"blocks.{2 * i + 1}", num_heads) for i in range(n_pairs)
    ]
    params["blocks"] = {"spatial": _stack(spatial), "temporal": _stack(temporal)}

    params["final_layer"] = {
        "adaLN_modulation": _linear(sd, "final_layer.adaLN_modulation.1"),
        "linear": _linear(sd, "final_layer.linear"),
    }
    if strict:
        unconsumed = set(sd) - sd.consumed - set(_FROZEN_BUFFERS)
        if unconsumed:
            raise ValueError(
                "checkpoint contains keys the converter does not map (would "
                f"be silently dropped): {sorted(unconsumed)[:10]}"
                + ("..." if len(unconsumed) > 10 else "")
                + " — pass strict=False to drop them deliberately"
            )
    return params


def load_torch_checkpoint(path: str, prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a reference `.pt` checkpoint; prefers the "ema" weights like the
    reference loader (`utils.py:274-287`)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if prefer_ema and "ema" in ckpt:
            ckpt = ckpt["ema"]
        elif "model" in ckpt:
            ckpt = ckpt["model"]
    return {k: v.numpy() for k, v in ckpt.items()}


def flax_to_reference_state_dict(
    params: Mapping[str, Any], depth: int, num_heads: int = 16
) -> Dict[str, np.ndarray]:
    """Inverse mapping (for exporting checkpoints back to the reference
    format). Frozen sincos buffers are not emitted."""
    params = {k: v for k, v in params.items()}
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix: str, p: Mapping[str, np.ndarray]):
        sd[f"{prefix}.weight"] = _t(np.asarray(p["kernel"]))
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    k = np.asarray(params["x_embedder"]["proj"]["kernel"])  # (C*p*p, D)
    D = k.shape[1]
    sd["x_embedder.proj.weight"] = _t(k)  # (D, C*p*p) — caller may reshape to conv
    sd["x_embedder.proj.bias"] = np.asarray(params["x_embedder"]["proj"]["bias"])
    put_linear("t_embedder.mlp.0", params["t_embedder"]["mlp_0"])
    put_linear("t_embedder.mlp.2", params["t_embedder"]["mlp_2"])
    if "y_embedder" in params:
        sd["y_embedder.embedding_table.weight"] = np.asarray(
            params["y_embedder"]["embedding_table"]
        )

    def unstack(tree, i):
        if isinstance(tree, Mapping):
            return {k: unstack(v, i) for k, v in tree.items()}
        return np.asarray(tree)[i]

    def put_qkv(prefix, p):
        k = np.asarray(p["kernel"])  # (D, 3D) head-major (H,3,hd)
        d = k.shape[0]
        hd = d // num_heads
        w = k.reshape(d, num_heads, 3, hd).transpose(2, 1, 3, 0).reshape(3 * d, d)
        sd[f"{prefix}.weight"] = np.ascontiguousarray(w)
        if "bias" in p:
            b = np.asarray(p["bias"]).reshape(num_heads, 3, hd)
            sd[f"{prefix}.bias"] = np.ascontiguousarray(
                b.transpose(1, 0, 2).reshape(-1)
            )

    n_pairs = depth // 2
    for i in range(n_pairs):
        for kind, ref_idx in (("spatial", 2 * i), ("temporal", 2 * i + 1)):
            blk = unstack(params["blocks"][kind], i)
            put_qkv(f"blocks.{ref_idx}.attn.qkv", blk["attn"]["qkv"])
            put_linear(f"blocks.{ref_idx}.attn.proj", blk["attn"]["proj"])
            put_linear(f"blocks.{ref_idx}.mlp.fc1", blk["mlp"]["fc1"])
            put_linear(f"blocks.{ref_idx}.mlp.fc2", blk["mlp"]["fc2"])
            put_linear(
                f"blocks.{ref_idx}.adaLN_modulation.1", blk["adaLN_modulation"]
            )
    put_linear("final_layer.adaLN_modulation.1", params["final_layer"]["adaLN_modulation"])
    put_linear("final_layer.linear", params["final_layer"]["linear"])
    return sd
