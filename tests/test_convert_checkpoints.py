"""Published-config checkpoint conversion hardening (VERDICT r3 item 5).

The closest achievable proxy (zero egress) to loading the published
`maxin-cn/Latte` weights: `torch.save` reference-code checkpoints from the
oracle models (`/root/reference/models/latte.py` executed via the timm shim)
at EVERY published registry config — XL/L/B/S at their real depth/width/head
counts (`/root/reference/models/latte.py:464-506`), extras ∈ {1, 2}, the
LatteIMG joint variant, and LatteT2V at Latte-1 scale widths — and
round-trip each through `tools/convert.py` / `convert_t2v.py` with forward
parity asserted against the torch model.

This exercises the SURVEY §7.3 converter edge cases at the real shapes:
fused-qkv head-major relayout at heads ∈ {6, 12, 16}, patch-embed conv
layout, `{"model", "ema"}` container with ema preference
(`/root/reference/utils.py:274-287`), frozen-buffer dropping, and the
adaLN-single `scale_shift_table` params (T2V).

Spatial/temporal extents are kept tiny (8² latents, 2 frames) — the
conversion-relevant dimensions are depth/hidden/heads, which are at the
published values; token counts only scale the forward cost.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_reference

# published size table (`/root/reference/models/latte.py:464-506`)
SIZES = {
    "XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "L": dict(depth=24, hidden_size=1024, num_heads=16),
    "B": dict(depth=12, hidden_size=768, num_heads=12),
    "S": dict(depth=12, hidden_size=384, num_heads=6),
}

INPUT, FRAMES, PATCH, INCH = 8, 2, 2, 4


def _perturb_(tmodel, seed, scale=0.05):
    """Perturb trainable torch params away from adaLN-zero init (zeroed
    gates/final layer make the forward vacuously input-independent).
    Frozen sincos buffers stay exact — our converter recomputes them."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.requires_grad:
                p.add_(scale * torch.randn(p.shape, generator=g))


def _save_reference_ckpt(tmodel, path, seed):
    """torch.save the reference's {"model", "ema"} container; ema is a
    further-perturbed copy so ema-preference is observable."""
    import copy

    import torch

    ema = copy.deepcopy(tmodel)
    _perturb_(ema, seed + 1, scale=0.02)
    torch.save(
        {"model": tmodel.state_dict(), "ema": ema.state_dict()}, str(path)
    )
    return ema


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize("size", list(SIZES))
@pytest.mark.parametrize("extras", [1, 2])
def test_published_config_roundtrip(size, extras, tmp_path, rng_np):
    import torch

    from latte_tpu.models import Latte
    from latte_tpu.tools.convert import (
        convert_latte_state_dict,
        load_torch_checkpoint,
    )
    from latte_tpu.tools.reference_oracle import load_reference_latte

    cfg = SIZES[size]
    ref = load_reference_latte()
    torch.manual_seed(0)
    tmodel = ref.Latte(
        input_size=INPUT,
        patch_size=PATCH,
        in_channels=INCH,
        num_frames=FRAMES,
        extras=extras,
        num_classes=101,
        attention_mode="math",
        **{k: v for k, v in cfg.items()},
    )
    _perturb_(tmodel, seed=7)
    path = tmp_path / f"latte_{size}_e{extras}.pt"
    ema = _save_reference_ckpt(tmodel, path, seed=11)
    ema.eval()

    # reference-loader semantics: prefer the "ema" weights
    sd = load_torch_checkpoint(str(path))
    sd_model = load_torch_checkpoint(str(path), prefer_ema=False)
    # delete the multi-GB .pt immediately: pytest retains tmp dirs across
    # sessions, and XL-size checkpoints x configs x 3 retained runs filled
    # /tmp (the round-4 full-suite ENOSPC)
    os.remove(path)
    params = convert_latte_state_dict(
        sd, depth=cfg["depth"], num_heads=cfg["num_heads"]
    )

    model = Latte(
        input_size=INPUT,
        patch_size=PATCH,
        in_channels=INCH,
        num_frames=FRAMES,
        extras=extras,
        num_classes=101,
        attention_mode="xla",
        **{k: v for k, v in cfg.items()},
    )
    x = rng_np.standard_normal((1, FRAMES, INCH, INPUT, INPUT)).astype(np.float32)
    t = np.array([250])
    kw = {"y": jnp.array([5])} if extras == 2 else {}
    tkw = {"y": torch.tensor([5])} if extras == 2 else {}

    ours = np.asarray(
        model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x),
            jnp.asarray(t),
            **kw,
        )
    )
    with torch.no_grad():
        theirs = ema(torch.from_numpy(x), torch.from_numpy(t), **tkw).numpy()
    assert ours.shape == theirs.shape == (1, FRAMES, 2 * INCH, INPUT, INPUT)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)

    # and the non-ema weights must differ — proof ema preference was real
    qk = "blocks.0.attn.qkv.weight"
    assert not np.allclose(sd[qk], sd_model[qk])


@requires_reference
@pytest.mark.slow
def test_published_config_roundtrip_extras78(tmp_path, rng_np):
    """The legacy CLIP pooled-text path (extras=78): its
    text_embedding_projection (77·768 -> D) must convert too."""
    import torch

    from latte_tpu.models import Latte
    from latte_tpu.tools.convert import (
        convert_latte_state_dict,
        load_torch_checkpoint,
    )
    from latte_tpu.tools.reference_oracle import load_reference_latte

    cfg = SIZES["S"]
    ref = load_reference_latte()
    torch.manual_seed(1)
    tmodel = ref.Latte(
        input_size=INPUT,
        patch_size=PATCH,
        in_channels=INCH,
        num_frames=FRAMES,
        extras=78,
        attention_mode="math",
        **cfg,
    )
    _perturb_(tmodel, seed=3)
    path = tmp_path / "latte_s_e78.pt"
    ema = _save_reference_ckpt(tmodel, path, seed=5)
    ema.eval()

    sd = load_torch_checkpoint(str(path))
    os.remove(path)  # free the tmp checkpoint immediately (see above)
    params = convert_latte_state_dict(
        sd, depth=cfg["depth"], num_heads=cfg["num_heads"]
    )
    model = Latte(
        input_size=INPUT,
        patch_size=PATCH,
        in_channels=INCH,
        num_frames=FRAMES,
        extras=78,
        attention_mode="xla",
        **cfg,
    )
    x = rng_np.standard_normal((1, FRAMES, INCH, INPUT, INPUT)).astype(np.float32)
    emb = rng_np.standard_normal((1, 77, 768)).astype(np.float32)
    t = np.array([99])
    ours = np.asarray(
        model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x),
            jnp.asarray(t),
            text_embedding=jnp.asarray(emb),
        )
    )
    with torch.no_grad():
        theirs = ema(
            torch.from_numpy(x),
            torch.from_numpy(t),
            text_embedding=torch.from_numpy(emb),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize("size", ["XL", "B"])
def test_published_config_roundtrip_img(size, tmp_path, rng_np):
    """LatteIMG joint video+image checkpoints (same key namespace,
    `/root/reference/models/latte_img.py`) at published widths."""
    import torch

    from latte_tpu.models.dit_img import LatteIMG
    from latte_tpu.tools.convert import (
        convert_latte_state_dict,
        load_torch_checkpoint,
    )
    from latte_tpu.tools.reference_oracle import load_reference_latte_img

    cfg = SIZES[size]
    I = 2  # joint still images
    ref = load_reference_latte_img()
    torch.manual_seed(2)
    tmodel = ref.Latte(
        input_size=INPUT,
        patch_size=PATCH,
        in_channels=INCH,
        num_frames=FRAMES,
        extras=2,
        num_classes=101,
        class_dropout_prob=0.0,
        attention_mode="math",
        **cfg,
    )
    _perturb_(tmodel, seed=13)
    path = tmp_path / f"latte_img_{size}.pt"
    ema = _save_reference_ckpt(tmodel, path, seed=17)
    ema.train()  # joint y_image path only runs with self.training

    sd = load_torch_checkpoint(str(path))
    os.remove(path)  # free the tmp checkpoint immediately (see above)
    params = convert_latte_state_dict(
        sd, depth=cfg["depth"], num_heads=cfg["num_heads"]
    )
    model = LatteIMG(
        input_size=INPUT,
        patch_size=PATCH,
        in_channels=INCH,
        num_frames=FRAMES,
        use_image_num=I,
        extras=2,
        num_classes=101,
        class_dropout_prob=0.0,
        attention_mode="xla",
        **cfg,
    )
    x = rng_np.standard_normal((1, FRAMES + I, INCH, INPUT, INPUT)).astype(
        np.float32
    )
    t = np.array([42])
    y = np.array([3])
    y_image = np.array([[7, 11]])
    ours = np.asarray(
        model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x),
            jnp.asarray(t),
            y=jnp.asarray(y),
            y_image=jnp.asarray(y_image),
            train=True,
            rngs={"label_dropout": jax.random.PRNGKey(0)},
        )
    )
    with torch.no_grad():
        theirs = ema(
            torch.from_numpy(x),
            torch.from_numpy(t),
            y=torch.from_numpy(y),
            y_image=torch.from_numpy(y_image),
            use_image_num=I,
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


@requires_reference
@pytest.mark.slow
def test_published_config_roundtrip_t2v(rng_np):
    """LatteT2V at Latte-1 scale widths (28 layers, heads 16 × head_dim 72,
    caption_channels 4096 — `maxin-cn/Latte-1` transformer config): the
    reference torch model's state_dict (diffusers format, the shape
    `from_pretrained` would hand us) through `convert_t2v_state_dict` with
    forward parity, covering the per-block AND top-level scale_shift_table
    params at real scale."""
    import torch

    from latte_tpu.models.t2v import LatteT2V
    from latte_tpu.tools.convert_t2v import convert_t2v_state_dict
    from latte_tpu.tools.reference_oracle import load_reference_latte_t2v

    cfg = dict(
        num_attention_heads=16,
        attention_head_dim=72,
        in_channels=4,
        out_channels=8,
        num_layers=28,
        patch_size=2,
        sample_size=INPUT,
        cross_attention_dim=1152,
        caption_channels=4096,
        video_length=FRAMES,
    )
    ref = load_reference_latte_t2v()
    torch.manual_seed(4)
    tmodel = ref.LatteT2V(
        norm_type="ada_norm_single",
        norm_elementwise_affine=False,
        norm_eps=1e-6,
        attention_bias=True,
        activation_fn="gelu-approximate",
        num_embeds_ada_norm=1000,
        **cfg,
    )
    _perturb_(tmodel, seed=19, scale=0.02)
    tmodel.eval()

    params = convert_t2v_state_dict(tmodel.state_dict(), num_layers=cfg["num_layers"])

    model = LatteT2V(attention_mode="xla", **cfg)
    # LatteT2V takes diffusers layout (B, C, F, H, W) — `latte_t2v.py:677`
    x = rng_np.standard_normal((1, 4, FRAMES, INPUT, INPUT)).astype(np.float32)
    t = np.array([470])
    ctx = (rng_np.standard_normal((1, 8, 4096)) * 0.1).astype(np.float32)
    mask = np.array([[1] * 6 + [0] * 2], dtype=np.int64)

    ours = np.asarray(
        model.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(ctx),
            jnp.asarray(mask.astype(np.int32)),
        )
    )
    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(x),
            timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ctx),
            encoder_attention_mask=torch.from_numpy(mask),
            return_dict=False,
        )[0].numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


@requires_reference
def test_strict_mode_rejects_unknown_keys(rng_np):
    """A checkpoint with weights the mapping would silently drop must fail
    loudly (strict default); strict=False drops them deliberately."""
    import torch

    from latte_tpu.tools.convert import convert_latte_state_dict
    from latte_tpu.tools.reference_oracle import load_reference_latte

    ref = load_reference_latte()
    torch.manual_seed(6)
    tmodel = ref.Latte(
        input_size=INPUT,
        patch_size=PATCH,
        in_channels=INCH,
        num_frames=FRAMES,
        extras=1,
        depth=2,
        hidden_size=32,
        num_heads=2,
        attention_mode="math",
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    sd["blocks.0.attn.q_norm.weight"] = np.ones((16,), np.float32)
    with pytest.raises(ValueError, match="q_norm"):
        convert_latte_state_dict(sd, depth=2, num_heads=2)
    params = convert_latte_state_dict(sd, depth=2, num_heads=2, strict=False)
    assert "blocks" in params


@requires_reference
def test_t2v_strict_mode_rejects_unknown_keys():
    import torch

    from latte_tpu.tools.convert_t2v import convert_t2v_state_dict
    from latte_tpu.tools.reference_oracle import load_reference_latte_t2v

    ref = load_reference_latte_t2v()
    torch.manual_seed(8)
    tmodel = ref.LatteT2V(
        norm_type="ada_norm_single",
        norm_elementwise_affine=False,
        norm_eps=1e-6,
        attention_bias=True,
        activation_fn="gelu-approximate",
        num_embeds_ada_norm=1000,
        num_attention_heads=2,
        attention_head_dim=8,
        in_channels=4,
        out_channels=8,
        num_layers=1,
        patch_size=2,
        sample_size=8,
        cross_attention_dim=16,
        caption_channels=32,
        video_length=2,
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    sd["transformer_blocks.0.attn1.extra.weight"] = np.ones((4, 4), np.float32)
    with pytest.raises(ValueError, match="extra"):
        convert_t2v_state_dict(sd, num_layers=1)
    params = convert_t2v_state_dict(sd, num_layers=1, strict=False)
    assert "blocks" in params
