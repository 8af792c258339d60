"""Checkpoint-converter tests: reference-style state dicts -> Flax params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latte_tpu.models import Latte
from latte_tpu.tools.convert import (
    convert_latte_state_dict,
    flax_to_reference_state_dict,
)

DEPTH, HIDDEN, HEADS, PATCH, INCH = 4, 32, 2, 2, 4


def make_reference_state_dict(rng):
    """Synthesize a state dict with the reference's key naming/shapes
    (`/root/reference/models/latte.py` module tree)."""
    sd = {}

    def lin(prefix, dout, din):
        sd[f"{prefix}.weight"] = rng.standard_normal((dout, din)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal((dout,)).astype(np.float32)

    sd["x_embedder.proj.weight"] = rng.standard_normal(
        (HIDDEN, INCH, PATCH, PATCH)
    ).astype(np.float32)
    sd["x_embedder.proj.bias"] = rng.standard_normal((HIDDEN,)).astype(np.float32)
    lin("t_embedder.mlp.0", HIDDEN, 256)
    lin("t_embedder.mlp.2", HIDDEN, HIDDEN)
    sd["y_embedder.embedding_table.weight"] = rng.standard_normal(
        (11, HIDDEN)
    ).astype(np.float32)
    for i in range(DEPTH):
        lin(f"blocks.{i}.attn.qkv", 3 * HIDDEN, HIDDEN)
        lin(f"blocks.{i}.attn.proj", HIDDEN, HIDDEN)
        lin(f"blocks.{i}.mlp.fc1", 4 * HIDDEN, HIDDEN)
        lin(f"blocks.{i}.mlp.fc2", HIDDEN, 4 * HIDDEN)
        lin(f"blocks.{i}.adaLN_modulation.1", 6 * HIDDEN, HIDDEN)
    lin("final_layer.adaLN_modulation.1", 2 * HIDDEN, HIDDEN)
    lin("final_layer.linear", PATCH * PATCH * 2 * INCH, HIDDEN)
    # frozen buffers that must be ignored
    sd["pos_embed"] = np.zeros((1, 16, HIDDEN), np.float32)
    sd["temp_embed"] = np.zeros((1, 4, HIDDEN), np.float32)
    return sd


def model_and_init():
    m = Latte(
        input_size=8,
        patch_size=PATCH,
        hidden_size=HIDDEN,
        depth=DEPTH,
        num_heads=HEADS,
        num_frames=4,
        extras=2,
        num_classes=10,
        attention_mode="xla",
    )
    x = jnp.zeros((1, 4, INCH, 8, 8))
    rngs = {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)}
    variables = m.init(rngs, x, jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32))
    return m, variables


class TestConvert:
    def test_tree_structure_matches_init(self, rng_np):
        sd = make_reference_state_dict(rng_np)
        params = convert_latte_state_dict(sd, depth=DEPTH, num_heads=HEADS)
        m, variables = model_and_init()
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
        got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(
            got_shapes
        )
        assert ref_shapes == got_shapes

    def test_converted_params_run(self, rng_np):
        sd = make_reference_state_dict(rng_np)
        params = convert_latte_state_dict(sd, depth=DEPTH, num_heads=HEADS)
        m, _ = model_and_init()
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, INCH, 8, 8))
        out = m.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            x,
            jnp.array([1, 2]),
            y=jnp.array([0, 5]),
        )
        assert out.shape == (2, 4, 2 * INCH, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_linear_orientation(self, rng_np):
        """Dense(kernel) must equal torch's x @ W.T + b."""
        sd = make_reference_state_dict(rng_np)
        params = convert_latte_state_dict(sd, depth=DEPTH, num_heads=HEADS)
        W = sd["t_embedder.mlp.0.weight"]
        b = sd["t_embedder.mlp.0.bias"]
        x = rng_np.standard_normal((3, 256)).astype(np.float32)
        ours = x @ np.asarray(params["t_embedder"]["mlp_0"]["kernel"]) + np.asarray(
            params["t_embedder"]["mlp_0"]["bias"]
        )
        theirs = x @ W.T + b
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_patch_embed_equals_conv(self, rng_np):
        """Patchify+Dense == strided conv with the original weight."""
        import torch
        import torch.nn.functional as tF

        sd = make_reference_state_dict(rng_np)
        params = convert_latte_state_dict(sd, depth=DEPTH, num_heads=HEADS)
        x = rng_np.standard_normal((1, INCH, 8, 8)).astype(np.float32)

        conv = tF.conv2d(
            torch.from_numpy(x),
            torch.from_numpy(sd["x_embedder.proj.weight"]),
            torch.from_numpy(sd["x_embedder.proj.bias"]),
            stride=PATCH,
        )  # (1, D, 4, 4)
        ref_tokens = conv.flatten(2).transpose(1, 2).numpy()  # (1, 16, D)

        from latte_tpu.models.layers import PatchEmbed

        pe = PatchEmbed(patch_size=PATCH, hidden_size=HIDDEN)
        ours = pe.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params["x_embedder"])},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(ours), ref_tokens, rtol=1e-4, atol=1e-5)

    def test_roundtrip(self, rng_np):
        sd = make_reference_state_dict(rng_np)
        params = convert_latte_state_dict(sd, depth=DEPTH, num_heads=HEADS)
        back = flax_to_reference_state_dict(params, depth=DEPTH, num_heads=HEADS)
        for k, v in back.items():
            if k == "x_embedder.proj.weight":
                np.testing.assert_allclose(
                    v, sd[k].reshape(v.shape), rtol=1e-6, err_msg=k
                )
            else:
                np.testing.assert_allclose(v, sd[k], rtol=1e-6, err_msg=k)


class TestQKVLayout:
    def test_attention_matches_torch_fused_qkv(self, rng_np):
        """Our head-major qkv layout must reproduce torch's [q|k|v] fused
        attention exactly (independent torch-math oracle)."""
        import torch

        import jax
        import jax.numpy as jnp

        from latte_tpu.models.layers import Attention
        from latte_tpu.tools.convert import _qkv_linear

        D, H = HIDDEN, HEADS
        hd = D // H
        sd = {
            "w.weight": rng_np.standard_normal((3 * D, D)).astype(np.float32),
            "w.bias": rng_np.standard_normal((3 * D,)).astype(np.float32),
        }
        proj_w = rng_np.standard_normal((D, D)).astype(np.float32)
        proj_b = rng_np.standard_normal((D,)).astype(np.float32)
        x = rng_np.standard_normal((2, 5, D)).astype(np.float32)

        # torch oracle: fused qkv -> (3, B, H, N, hd) -> softmax attention
        xt = torch.from_numpy(x)
        qkv = xt @ torch.from_numpy(sd["w.weight"]).T + torch.from_numpy(sd["w.bias"])
        B, N, _ = x.shape
        qkv = qkv.reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = torch.softmax((q @ k.transpose(-2, -1)) * hd**-0.5, dim=-1)
        ref = (attn @ v).transpose(1, 2).reshape(B, N, D)
        ref = (ref @ torch.from_numpy(proj_w).T + torch.from_numpy(proj_b)).numpy()

        params = {
            "qkv": jax.tree_util.tree_map(jnp.asarray, _qkv_linear(sd, "w", H)),
            "proj": {"kernel": jnp.asarray(proj_w.T), "bias": jnp.asarray(proj_b)},
        }
        ours = Attention(dim=D, num_heads=H, mode="xla").apply(
            {"params": params}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)
