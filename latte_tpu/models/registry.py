"""Model registry: named Latte configurations (XL/L/B/S × patch 2/4/8).

Parity with `/root/reference/models/latte.py:464-506` and
`models/latte_img.py:524-529`; `get_model` mirrors the dispatch semantics of
`models/__init__.py:31-51`.
"""

from __future__ import annotations

from typing import Any, Dict

from latte_tpu.models.dit import Latte
from latte_tpu.models.dit_img import LatteIMG

_SIZES: Dict[str, Dict[str, Any]] = {
    "XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "L": dict(depth=24, hidden_size=1024, num_heads=16),
    "B": dict(depth=12, hidden_size=768, num_heads=12),
    "S": dict(depth=12, hidden_size=384, num_heads=6),
}
_PATCHES = (2, 4, 8)

Latte_models: Dict[str, Dict[str, Any]] = {
    f"Latte-{s}/{p}": dict(patch_size=p, **cfg)
    for s, cfg in _SIZES.items()
    for p in _PATCHES
}
LatteIMG_models: Dict[str, Dict[str, Any]] = {
    f"LatteIMG-{s}/{p}": dict(patch_size=p, **cfg)
    for s, cfg in _SIZES.items()
    for p in _PATCHES
}


def get_model(name: str, **overrides):
    """Build a model module by registry name, e.g. ``Latte-XL/2``."""
    if name in Latte_models:
        return Latte(**{**Latte_models[name], **overrides})
    if name in LatteIMG_models:
        return LatteIMG(**{**LatteIMG_models[name], **overrides})
    raise ValueError(f"unknown model {name!r}; known: {sorted(Latte_models)}")


def get_models(args):
    """Config-object factory mirroring the reference entry-point seam.

    ``args`` needs: model, image_size, num_frames, learn_sigma, extras, and
    optionally num_classes / attention_mode / gradient_checkpointing /
    use_image_num.
    """
    latent_size = int(
        getattr(args, "latent_size", 0) or int(getattr(args, "image_size", 256)) // 8
    )
    common = dict(
        input_size=latent_size,
        num_frames=int(getattr(args, "num_frames", 16)),
        learn_sigma=bool(getattr(args, "learn_sigma", True)),
        extras=int(getattr(args, "extras", 1)),
    )
    if getattr(args, "num_classes", None):
        common["num_classes"] = int(args.num_classes)
    if getattr(args, "attention_mode", None):
        common["attention_mode"] = str(args.attention_mode)
    if getattr(args, "gradient_checkpointing", False):
        common["gradient_checkpointing"] = True
        if getattr(args, "remat_policy", None):
            common["remat_policy"] = str(args.remat_policy)
    if getattr(args, "unroll_blocks", None) is not None:
        # lax.scan execution hint only — the stacked param tree, shardings
        # and checkpoints are identical either way. Unrolling folds away
        # the scan's per-iteration weight-slice copies (measured +26% on
        # the XL/2 train step, docs/tpu_notes.md "training roofline") at
        # the cost of a larger program / longer compile.
        common["unroll_blocks"] = bool(args.unroll_blocks)
    if getattr(args, "fused_adaln", False):
        # Pallas-fused LN+modulate+residual glue (kernels/adaln.py). A
        # pallas_call is opaque to GSPMD, so entry points that build a
        # sharded mesh (tensor_parallel / dp / sp) must reject or drop
        # this flag — see models/layers.py AdaLNBlock.fused_adaln.
        common["fused_adaln"] = True
    ia = getattr(args, "int8_attention", False)
    if ia:
        # int8 attention core for static-W8A8 serving (quant/int8.int8_attention):
        # the attention matmuls run int8 on the MXU with calibrated per-head
        # scales. True/'full' = QKᵀ and P·V int8 (P·V at a per-row
        # probability scale); 'qk' = QKᵀ only. Single choke point for the
        # flag's contracts so misuse fails HERE, not as silent bf16 serving:
        if ia not in (True, "full", "qk"):
            raise ValueError(
                f"int8_attention: {ia!r}; expected true, 'full' or 'qk'"
            )
        q = getattr(args, "quantized", None)
        if str(q) not in ("static", "calib"):
            raise ValueError(
                "int8_attention requires quantized: static (the calibrated-"
                f"scale W8A8 serving path); got quantized: {q!r} — fp, "
                "dynamic int8 and QAT have no calibrated attention scales"
            )
        common["int8_attention"] = ia
    if getattr(args, "model_overrides", None):
        # explicit architecture overrides (depth/hidden_size/num_heads/...):
        # lets smoke tests and scaling sweeps shrink or reshape a registry
        # config without registering a new name
        common.update(dict(args.model_overrides))
    if getattr(args, "moe_experts", 0):
        # Mixture-of-Experts FF (models/moe.py) — beyond-reference scaling
        common["moe_experts"] = int(args.moe_experts)
        if getattr(args, "moe_top_k", None):
            common["moe_top_k"] = int(args.moe_top_k)
        if getattr(args, "moe_capacity_factor", None):
            common["moe_capacity_factor"] = float(args.moe_capacity_factor)
    name = args.model
    if name in LatteIMG_models:
        common["use_image_num"] = int(getattr(args, "use_image_num", 0))
    return get_model(name, **common)
