"""Convert reference LatteT2V (diffusers-format) weights -> Flax params.

Maps the torch module tree of `/root/reference/models/latte_t2v.py:444-676`
(diffusers naming: ``transformer_blocks.N.attn1.to_q`` etc.) onto our
scanned-pair layout (`latte_tpu/models/t2v.py`):

- transformer_blocks.N          -> blocks/spatial  (stacked axis 0)
- temporal_transformer_blocks.N -> blocks/temporal (stacked axis 0)
- pos_embed.proj (conv)         -> pos_embed/proj Dense (C·p·p, D)
- adaln_single.emb.timestep_embedder.linear_{1,2} -> adaln_single/emb/mlp_{0,2}
- adaln_single.linear, caption_projection.linear_{1,2}, proj_out,
  scale_shift_table (top-level (2, D) + per-block (6, D)) map directly
- frozen buffers (temp_pos_embed, y_embedding) are dropped (recomputed /
  negative prompts handled by the pipeline)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from latte_tpu.tools.convert import _TrackingDict, _linear, _stack, _t

__all__ = ["convert_t2v_state_dict"]

#: frozen/unused buffers legitimately dropped: temp_pos_embed is recomputed
#: (reference `latte_t2v.py:668-670`), caption_projection.y_embedding is the
#: unused negative-prompt embedding table.
_T2V_BUFFERS = ("temp_pos_embed", "caption_projection.y_embedding")


def _attn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    out = {
        "to_q": _linear(sd, f"{prefix}.to_q"),
        "to_k": _linear(sd, f"{prefix}.to_k"),
        "to_v": _linear(sd, f"{prefix}.to_v"),
        "to_out": _linear(sd, f"{prefix}.to_out.0"),
    }
    return out


def _ff(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "net_0_proj": _linear(sd, f"{prefix}.net.0.proj"),
        "net_2": _linear(sd, f"{prefix}.net.2"),
    }


def _spatial_block(sd, prefix):
    return {
        "scale_shift_table": np.asarray(sd[f"{prefix}.scale_shift_table"]),
        "attn1": _attn(sd, f"{prefix}.attn1"),
        "attn2": _attn(sd, f"{prefix}.attn2"),
        "ff": _ff(sd, f"{prefix}.ff"),
    }


def _temporal_block(sd, prefix):
    return {
        "scale_shift_table": np.asarray(sd[f"{prefix}.scale_shift_table"]),
        "attn1": _attn(sd, f"{prefix}.attn1"),
        "ff": _ff(sd, f"{prefix}.ff"),
    }


def convert_t2v_state_dict(
    sd: Mapping[str, Any], num_layers: int, strict: bool = True
) -> Dict[str, Any]:
    sd = _TrackingDict({
        k: np.asarray(
            getattr(v, "detach", lambda: v)().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in sd.items()
    })
    params: Dict[str, Any] = {}

    w = sd["pos_embed.proj.weight"]  # (D, C, p, p)
    params["pos_embed"] = {
        "proj": {
            "kernel": _t(w.reshape(w.shape[0], -1)),
            "bias": sd["pos_embed.proj.bias"],
        }
    }
    params["adaln_single"] = {
        "emb": {
            "mlp_0": _linear(sd, "adaln_single.emb.timestep_embedder.linear_1"),
            "mlp_2": _linear(sd, "adaln_single.emb.timestep_embedder.linear_2"),
        },
        "linear": _linear(sd, "adaln_single.linear"),
    }
    params["caption_projection"] = {
        "linear_1": _linear(sd, "caption_projection.linear_1"),
        "linear_2": _linear(sd, "caption_projection.linear_2"),
    }

    spatial = [
        _spatial_block(sd, f"transformer_blocks.{i}") for i in range(num_layers)
    ]
    temporal = [
        _temporal_block(sd, f"temporal_transformer_blocks.{i}")
        for i in range(num_layers)
    ]
    params["blocks"] = {"spatial": _stack(spatial), "temporal": _stack(temporal)}

    params["scale_shift_table"] = np.asarray(sd["scale_shift_table"])
    params["proj_out"] = _linear(sd, "proj_out")
    if strict:
        unconsumed = set(sd) - sd.consumed - set(_T2V_BUFFERS)
        if unconsumed:
            raise ValueError(
                "T2V checkpoint contains keys the converter does not map "
                f"(would be silently dropped): {sorted(unconsumed)[:10]}"
                + ("..." if len(unconsumed) > 10 else "")
                + " — pass strict=False to drop them deliberately"
            )
    return params


def load_t2v_checkpoint(path: str, num_layers: int = 28) -> Dict[str, Any]:
    """Load a torch .pt / safetensors LatteT2V checkpoint and convert."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return convert_t2v_state_dict(sd, num_layers=num_layers)


def flax_to_reference_t2v_state_dict(
    params: Mapping[str, Any], num_layers: int
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_t2v_state_dict` — export our Flax LatteT2V
    params as a reference/diffusers-named torch state_dict (used by the
    cross-framework oracle tests; frozen buffers are not emitted)."""
    import jax

    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix: str, p: Mapping[str, np.ndarray]):
        sd[f"{prefix}.weight"] = _t(np.asarray(p["kernel"]))
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    k = np.asarray(params["pos_embed"]["proj"]["kernel"])  # (C*p*p, D)
    sd["pos_embed.proj.weight"] = _t(k)  # (D, C*p*p) — caller reshapes to conv
    sd["pos_embed.proj.bias"] = np.asarray(params["pos_embed"]["proj"]["bias"])
    put_linear(
        "adaln_single.emb.timestep_embedder.linear_1", params["adaln_single"]["emb"]["mlp_0"]
    )
    put_linear(
        "adaln_single.emb.timestep_embedder.linear_2", params["adaln_single"]["emb"]["mlp_2"]
    )
    put_linear("adaln_single.linear", params["adaln_single"]["linear"])
    put_linear("caption_projection.linear_1", params["caption_projection"]["linear_1"])
    put_linear("caption_projection.linear_2", params["caption_projection"]["linear_2"])

    def unstack(tree, i):
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[i], tree)

    def put_attn(prefix, p):
        put_linear(f"{prefix}.to_q", p["to_q"])
        put_linear(f"{prefix}.to_k", p["to_k"])
        put_linear(f"{prefix}.to_v", p["to_v"])
        put_linear(f"{prefix}.to_out.0", p["to_out"])

    def put_ff(prefix, p):
        put_linear(f"{prefix}.net.0.proj", p["net_0_proj"])
        put_linear(f"{prefix}.net.2", p["net_2"])

    for i in range(num_layers):
        sp = unstack(params["blocks"]["spatial"], i)
        sd[f"transformer_blocks.{i}.scale_shift_table"] = np.asarray(sp["scale_shift_table"])
        put_attn(f"transformer_blocks.{i}.attn1", sp["attn1"])
        put_attn(f"transformer_blocks.{i}.attn2", sp["attn2"])
        put_ff(f"transformer_blocks.{i}.ff", sp["ff"])
        tp = unstack(params["blocks"]["temporal"], i)
        sd[f"temporal_transformer_blocks.{i}.scale_shift_table"] = np.asarray(
            tp["scale_shift_table"]
        )
        put_attn(f"temporal_transformer_blocks.{i}.attn1", tp["attn1"])
        put_ff(f"temporal_transformer_blocks.{i}.ff", tp["ff"])

    sd["scale_shift_table"] = np.asarray(params["scale_shift_table"])
    put_linear("proj_out", params["proj_out"])
    return sd
