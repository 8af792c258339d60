"""Load the reference PyTorch Latte model as a torch-CPU oracle.

The reference model (`/root/reference/models/latte.py`) imports exactly two
symbols from timm — `PatchEmbed` and `Mlp` (`latte.py:16`) — and this image
does not ship timm.  We install a minimal torch shim implementing the timm
API surface those two classes expose (standard ViT patchify-conv and
fc1/act/fc2 MLP; the `.proj` / `.fc1` / `.fc2` attribute names are the
contract, because the reference's `initialize_weights` and its checkpoint
keys reach into them), then import the reference module by file path.

This exists so cross-framework parity tests can execute the *reference
model code itself* (not a re-derivation) against our Flax models, and so
`scripts/make_reference_golden.py` can record reference-generated latents
as committed goldens.  Nothing here is imported by the framework's runtime.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE = "/root/reference"


def install_timm_shim() -> None:
    """Register `timm.models.vision_transformer.{PatchEmbed, Mlp}` shims.

    No-op when a real timm is importable or the shim is already installed.
    """
    if "timm.models.vision_transformer" in sys.modules:
        return
    try:  # pragma: no cover - image has no timm, but be polite if one appears
        import timm.models.vision_transformer  # noqa: F401

        return
    except ImportError:
        pass

    import torch.nn as nn

    class PatchEmbed(nn.Module):
        """timm-API patch embedding: strided conv + flatten to (B, N, D)."""

        def __init__(
            self,
            img_size=224,
            patch_size=16,
            in_chans=3,
            embed_dim=768,
            norm_layer=None,
            flatten=True,
            bias=True,
        ):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(
                in_chans, embed_dim, kernel_size=patch_size, stride=patch_size, bias=bias
            )
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)  # (B, D, N) -> (B, N, D)
            return self.norm(x)

    class Mlp(nn.Module):
        """timm-API transformer MLP: fc1 -> act -> fc2 (+dropout)."""

        def __init__(
            self,
            in_features,
            hidden_features=None,
            out_features=None,
            act_layer=nn.GELU,
            drop=0.0,
            bias=True,
        ):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    timm_mod = types.ModuleType("timm")
    models_mod = types.ModuleType("timm.models")
    vit_mod = types.ModuleType("timm.models.vision_transformer")
    vit_mod.PatchEmbed = PatchEmbed
    vit_mod.Mlp = Mlp
    models_mod.vision_transformer = vit_mod
    timm_mod.models = models_mod
    # a module in sys.modules with __spec__ = None breaks later
    # importlib.util.find_spec("timm") callers (e.g. transformers'
    # _is_package_available raises "timm.__spec__ is None")
    for m in (timm_mod, models_mod, vit_mod):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    sys.modules["timm"] = timm_mod
    sys.modules["timm.models"] = models_mod
    sys.modules["timm.models.vision_transformer"] = vit_mod


def load_reference_module(rel_path: str, name: str):
    """Import a reference source file by path (with the timm shim installed)."""
    install_timm_shim()
    path = os.path.join(REFERENCE, rel_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_latte():
    """Import `/root/reference/models/latte.py` and return the module."""
    return load_reference_module("models/latte.py", "_reference_latte")


def load_reference_latte_img():
    """Import `/root/reference/models/latte_img.py` (joint video+image)."""
    return load_reference_module("models/latte_img.py", "_reference_latte_img")


def build_reference_latte(flax_params, *, depth, num_heads, img=False, **latte_kwargs):
    """Construct the reference torch `Latte` (or the `latte_img.py` joint
    variant when ``img=True``) and load our Flax params into it.

    Returns the torch model in eval mode.  The frozen sincos buffers
    (pos_embed / temp_embed) are NOT loaded — the reference recomputes them
    in `initialize_weights` (`latte.py:266-271`), so agreement of the final
    outputs also validates our sincos tables.
    """
    import torch

    from latte_tpu.tools.convert import flax_to_reference_state_dict

    ref = load_reference_latte_img() if img else load_reference_latte()
    model = ref.Latte(depth=depth, num_heads=num_heads, **latte_kwargs)
    sd = flax_to_reference_state_dict(flax_params, depth=depth, num_heads=num_heads)
    # conv layout: exporter emits (D, C*p*p); torch Conv2d wants (D, C, p, p)
    w = sd["x_embedder.proj.weight"]
    p = model.x_embedder.patch_size[0]
    c = model.in_channels
    sd["x_embedder.proj.weight"] = w.reshape(w.shape[0], c, p, p)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    allowed_missing = {"pos_embed", "temp_embed"}
    missing = set(missing) - allowed_missing
    if missing or unexpected:
        raise ValueError(
            f"state_dict mismatch: missing={sorted(missing)} unexpected={sorted(unexpected)}"
        )
    model.eval()
    return model


def load_reference_latte_t2v():
    """Import `/root/reference/models/latte_t2v.py` via the diffusers shim
    (`latte_tpu.tools.diffusers_shim`)."""
    from latte_tpu.tools.diffusers_shim import install_diffusers_shim

    install_diffusers_shim()
    return load_reference_module("models/latte_t2v.py", "_reference_latte_t2v")


def build_reference_latte_t2v(flax_params, *, num_layers, **t2v_kwargs):
    """Construct the reference torch `LatteT2V` and load our Flax params.

    Frozen buffers (temp_pos_embed is non-persistent; caption_projection's
    y_embedding is unused by the forward) are not loaded.
    """
    import torch

    from latte_tpu.tools.convert_t2v import flax_to_reference_t2v_state_dict

    ref = load_reference_latte_t2v()
    model = ref.LatteT2V(num_layers=num_layers, **t2v_kwargs)
    sd = flax_to_reference_t2v_state_dict(flax_params, num_layers=num_layers)
    w = sd["pos_embed.proj.weight"]  # (D, C*p*p)
    c = t2v_kwargs["in_channels"]
    p = t2v_kwargs["patch_size"]
    sd["pos_embed.proj.weight"] = w.reshape(w.shape[0], c, p, p)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    allowed_missing = {"caption_projection.y_embedding"}
    missing = set(missing) - allowed_missing
    if missing or unexpected:
        raise ValueError(
            f"state_dict mismatch: missing={sorted(missing)} unexpected={sorted(unexpected)}"
        )
    model.eval()
    return model
