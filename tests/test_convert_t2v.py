"""LatteT2V converter: synthesized diffusers-named state dict -> Flax tree."""

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.models.t2v import LatteT2V
from latte_tpu.tools.convert_t2v import convert_t2v_state_dict

LAYERS, HEADS, HD, PATCH, CIN, COUT, XDIM, CAP = 2, 2, 16, 2, 4, 8, 32, 64
D = HEADS * HD


def make_t2v_state_dict(rng):
    sd = {}

    def lin(prefix, dout, din):
        sd[f"{prefix}.weight"] = rng.standard_normal((dout, din)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal((dout,)).astype(np.float32)

    def attn(prefix, kv_dim=D):
        lin(f"{prefix}.to_q", D, D)
        lin(f"{prefix}.to_k", D, kv_dim)
        lin(f"{prefix}.to_v", D, kv_dim)
        lin(f"{prefix}.to_out.0", D, D)

    def block(prefix, cross=True):
        sd[f"{prefix}.scale_shift_table"] = rng.standard_normal((6, D)).astype(np.float32)
        attn(f"{prefix}.attn1")
        if cross:
            attn(f"{prefix}.attn2", kv_dim=D)
        lin(f"{prefix}.ff.net.0.proj", 4 * D, D)
        lin(f"{prefix}.ff.net.2", D, 4 * D)

    sd["pos_embed.proj.weight"] = rng.standard_normal((D, CIN, PATCH, PATCH)).astype(np.float32)
    sd["pos_embed.proj.bias"] = rng.standard_normal((D,)).astype(np.float32)
    lin("adaln_single.emb.timestep_embedder.linear_1", D, 256)
    lin("adaln_single.emb.timestep_embedder.linear_2", D, D)
    lin("adaln_single.linear", 6 * D, D)
    lin("caption_projection.linear_1", D, CAP)
    lin("caption_projection.linear_2", D, D)
    for i in range(LAYERS):
        block(f"transformer_blocks.{i}", cross=True)
        block(f"temporal_transformer_blocks.{i}", cross=False)
    sd["scale_shift_table"] = rng.standard_normal((2, D)).astype(np.float32)
    lin("proj_out", PATCH * PATCH * COUT, D)
    # buffers to ignore
    sd["temp_pos_embed"] = np.zeros((1, 16, D), np.float32)
    return sd


def model_and_init():
    m = LatteT2V(
        num_attention_heads=HEADS,
        attention_head_dim=HD,
        num_layers=LAYERS,
        patch_size=PATCH,
        sample_size=8,
        cross_attention_dim=D,
        caption_channels=CAP,
        video_length=4,
        attention_mode="xla",
    )
    x = jnp.zeros((1, CIN, 4, 16, 16))
    variables = m.init(
        {"params": jax.random.PRNGKey(0)},
        x,
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 10, CAP)),
        None,
    )
    return m, variables


class TestT2VConvert:
    def test_structure_matches_init(self, rng_np):
        sd = make_t2v_state_dict(rng_np)
        params = convert_t2v_state_dict(sd, num_layers=LAYERS)
        _, variables = model_and_init()
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
        got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
        assert ref_shapes == got_shapes

    def test_converted_runs_finite(self, rng_np):
        sd = make_t2v_state_dict(rng_np)
        params = convert_t2v_state_dict(sd, num_layers=LAYERS)
        m, _ = model_and_init()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, CIN, 4, 16, 16)) * 0.1
        out = m.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            x,
            jnp.array([5]),
            jax.random.normal(jax.random.PRNGKey(2), (1, 10, CAP)) * 0.1,
            jnp.ones((1, 10), jnp.int32),
        )
        assert out.shape == (1, COUT, 4, 16, 16)
        assert np.isfinite(np.asarray(out)).all()
