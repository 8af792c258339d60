"""Cross-framework MODEL-level parity: Flax Latte vs the reference torch Latte.

This is the BASELINE.md north star: fp32-tolerance latent agreement with the
reference implementation at fixed seeds.  The reference *model code itself*
(`/root/reference/models/latte.py`, run on torch-CPU via the timm shim in
`latte_tpu/tools/reference_oracle.py`) is executed here — not a
re-derivation — with weights exported from our Flax init through
`tools/convert.flax_to_reference_state_dict`.

Covered:
- forward parity on a tiny class-conditional config (all code paths:
  patchify + sincos tables, adaLN blocks, temporal embed gating, final layer)
- forward parity at Latte-S width (hidden 384, 12 blocks, 6 heads)
- forward parity on one XL block pair (hidden 1152, 16 heads) — the exact
  tensor shapes the flagship model runs per pair
- full DDIM-10 trajectory parity (reference engine + reference model vs our
  engine + our model) from a shared x_T
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

from latte_tpu.models import Latte


def _make_pair(
    *,
    input_size=8,
    patch_size=2,
    hidden_size=64,
    depth=4,
    num_heads=4,
    num_frames=4,
    extras=1,
    num_classes=10,
    seed=0,
):
    """Build (flax_model, flax_params, torch_model) with identical weights."""
    import torch

    from latte_tpu.tools.reference_oracle import build_reference_latte

    model = Latte(
        input_size=input_size,
        patch_size=patch_size,
        in_channels=4,
        hidden_size=hidden_size,
        depth=depth,
        num_heads=num_heads,
        num_frames=num_frames,
        extras=extras,
        num_classes=num_classes,
        attention_mode="xla",
    )
    x = jnp.zeros((1, num_frames, 4, input_size, input_size))
    t = jnp.array([0])
    kw = {"y": jnp.array([0])} if extras == 2 else {}
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x, t, **kw)
    # perturb away from adaLN-zero init: with zeroed gates/final layer the
    # forward output is trivially 0 and the comparison would be vacuous
    keys = iter(jax.random.split(jax.random.PRNGKey(seed + 1), 10_000))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, jnp.float32),
        variables["params"],
    )

    torch.manual_seed(seed)
    tmodel = build_reference_latte(
        params,
        depth=depth,
        num_heads=num_heads,
        input_size=input_size,
        patch_size=patch_size,
        in_channels=4,
        hidden_size=hidden_size,
        num_frames=num_frames,
        extras=extras,
        num_classes=num_classes,
        attention_mode="math",
    )
    return model, params, tmodel


def _forward_both(model, params, tmodel, x, t, y=None, atol=2e-4):
    import torch

    kw = {} if y is None else {"y": jnp.asarray(y)}
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), **kw))
    tkw = {} if y is None else {"y": torch.from_numpy(np.asarray(y))}
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(np.asarray(t)), **tkw).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=atol)
    return ours, ref


@requires_reference
class TestReferenceModelParity:
    def test_forward_tiny_class_conditional(self, rng_np):
        model, params, tmodel = _make_pair(extras=2)
        x = rng_np.standard_normal((2, 4, 4, 8, 8)).astype(np.float32)
        t = np.array([3, 47])
        y = np.array([1, 7])
        _forward_both(model, params, tmodel, x, t, y=y)

    def test_forward_latte_s_width(self, rng_np):
        model, params, tmodel = _make_pair(
            hidden_size=384, depth=12, num_heads=6, extras=1, num_frames=2
        )
        x = rng_np.standard_normal((1, 2, 4, 8, 8)).astype(np.float32)
        t = np.array([250])
        _forward_both(model, params, tmodel, x, t, atol=5e-4)

    def test_forward_xl_block_pair(self, rng_np):
        """One XL-width (spatial, temporal) pair — flagship per-pair math."""
        model, params, tmodel = _make_pair(
            hidden_size=1152, depth=2, num_heads=16, extras=1, num_frames=2
        )
        x = rng_np.standard_normal((1, 2, 4, 8, 8)).astype(np.float32)
        t = np.array([999])
        _forward_both(model, params, tmodel, x, t, atol=1e-3)

    def test_ddim_trajectory_parity(self, rng_np):
        """Reference engine+model vs our engine+model: shared x_T, ddim10."""
        import torch

        from latte_tpu.core.diffusion import create_diffusion
        from latte_tpu.core.samplers import ddim_sample_loop

        sys.path.insert(0, REFERENCE)
        try:
            import diffusion as ref_diffusion_mod
        finally:
            sys.path.remove(REFERENCE)

        model, params, tmodel = _make_pair(extras=2)
        y = np.array([2, 5])
        xT = rng_np.standard_normal((2, 4, 4, 8, 8)).astype(np.float32)

        ref_d = ref_diffusion_mod.create_diffusion("ddim10")
        x = torch.from_numpy(xT.copy())
        ty = torch.from_numpy(y)
        with torch.no_grad():
            wrapped = ref_d._wrap_model(lambda xx, tt, **kw: tmodel(xx, tt, **kw))
            for i in reversed(range(ref_d.num_timesteps)):
                t = torch.tensor([i] * 2)
                x = ref_d.ddim_sample(wrapped, x, t, model_kwargs={"y": ty})["sample"]
        ref_final = x.numpy()

        ours_d = create_diffusion("ddim10")
        model_fn = lambda xx, tt, **kw: model.apply({"params": params}, xx, tt, **kw)
        our_final = np.asarray(
            ddim_sample_loop(
                ours_d, model_fn, jnp.asarray(xT), model_kwargs={"y": jnp.asarray(y)}
            )
        )
        np.testing.assert_allclose(our_final, ref_final, rtol=1e-3, atol=2e-4)


@requires_reference
class TestReferenceLatteIMGParity:
    """Joint video+image model (`/root/reference/models/latte_img.py`):
    per-image labels in train mode, temporal attention on video frames only."""

    def test_joint_forward_parity(self, rng_np):
        import torch

        from latte_tpu.models.dit_img import LatteIMG
        from latte_tpu.tools.reference_oracle import build_reference_latte

        Fv, I = 4, 2  # video frames + joint still images
        model = LatteIMG(
            input_size=8,
            patch_size=2,
            in_channels=4,
            hidden_size=64,
            depth=4,
            num_heads=4,
            num_frames=Fv,
            use_image_num=I,
            extras=2,
            num_classes=10,
            class_dropout_prob=0.0,  # train-mode forward must be deterministic
            attention_mode="xla",
        )
        x0 = jnp.zeros((1, Fv + I, 4, 8, 8))
        t0 = jnp.zeros((1,), jnp.int32)
        rngs = {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)}
        variables = model.init(
            rngs, x0, t0, y=jnp.zeros((1,), jnp.int32),
            y_image=jnp.zeros((1, I), jnp.int32), train=True,
        )
        keys = iter(jax.random.split(jax.random.PRNGKey(9), 10_000))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, jnp.float32),
            variables["params"],
        )

        tmodel = build_reference_latte(
            params, depth=4, num_heads=4, img=True,
            input_size=8, patch_size=2, in_channels=4, hidden_size=64,
            num_frames=Fv, extras=2, num_classes=10, class_dropout_prob=0.0,
            attention_mode="math",
        )
        tmodel.train()  # joint y_image path only runs with self.training

        x = rng_np.standard_normal((2, Fv + I, 4, 8, 8)).astype(np.float32)
        t = np.array([3, 47])
        y = np.array([1, 7])
        y_image = np.array([[2, 9], [0, 5]])

        ours = np.asarray(
            model.apply(
                {"params": params},
                jnp.asarray(x),
                jnp.asarray(t),
                y=jnp.asarray(y),
                y_image=jnp.asarray(y_image),
                train=True,
                rngs={"label_dropout": jax.random.PRNGKey(2)},
            )
        )
        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x),
                torch.from_numpy(t),
                y=torch.from_numpy(y),
                y_image=torch.from_numpy(y_image),
                use_image_num=I,
            ).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


@requires_reference
class TestReferenceLatteT2VParity:
    """Text-to-video flagship (`/root/reference/models/latte_t2v.py`), run
    via the diffusers shim (`latte_tpu.tools.diffusers_shim`).

    The temporal blocks, feed-forward, AdaLayerNormSingle and the whole
    Transformer3D orchestration under test are genuine reference code; the
    spatial BasicTransformerBlock and attention/activation leaves come from
    the shim (standard published diffusers/PixArt semantics)."""

    def _pair(self):
        from latte_tpu.models.t2v import LatteT2V
        from latte_tpu.tools.reference_oracle import build_reference_latte_t2v

        cfg = dict(
            num_attention_heads=2,
            attention_head_dim=16,
            in_channels=4,
            out_channels=8,
            num_layers=2,
            patch_size=2,
            sample_size=8,
            cross_attention_dim=32,
            caption_channels=64,
            video_length=4,
        )
        model = LatteT2V(attention_mode="xla", **cfg)
        x0 = jnp.zeros((1, 4, 4, 8, 8))
        t0 = jnp.array([0])
        ctx0 = jnp.zeros((1, 10, 64))
        mask0 = jnp.ones((1, 10), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x0, t0, ctx0, mask0)
        keys = iter(jax.random.split(jax.random.PRNGKey(3), 10_000))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, jnp.float32),
            variables["params"],
        )
        tmodel = build_reference_latte_t2v(
            params,
            norm_type="ada_norm_single",
            norm_elementwise_affine=False,
            norm_eps=1e-6,
            attention_bias=True,
            activation_fn="gelu-approximate",
            num_embeds_ada_norm=1000,
            **cfg,
        )
        return model, params, tmodel

    def test_t2v_forward_parity_with_caption_mask(self, rng_np):
        import torch

        model, params, tmodel = self._pair()
        x = rng_np.standard_normal((2, 4, 4, 8, 8)).astype(np.float32)
        t = np.array([3, 470])
        ctx = rng_np.standard_normal((2, 10, 64)).astype(np.float32)
        mask = np.array([[1] * 10, [1] * 6 + [0] * 4], dtype=np.int64)

        ours = np.asarray(
            model.apply(
                {"params": params},
                jnp.asarray(x),
                jnp.asarray(t),
                jnp.asarray(ctx),
                jnp.asarray(mask.astype(np.int32)),
            )
        )
        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x),
                timestep=torch.from_numpy(t),
                encoder_hidden_states=torch.from_numpy(ctx),
                encoder_attention_mask=torch.from_numpy(mask),
                return_dict=False,
            )[0].numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)

    def test_t2v_forward_parity_t2i_mode(self, rng_np):
        """enable_temporal_attentions=False (the reference's t2i path)."""
        import torch

        model, params, tmodel = self._pair()
        model = model.clone(enable_temporal_attentions=False)
        x = rng_np.standard_normal((1, 4, 4, 8, 8)).astype(np.float32)
        t = np.array([250])
        ctx = rng_np.standard_normal((1, 10, 64)).astype(np.float32)
        mask = np.ones((1, 10), np.int64)

        ours = np.asarray(
            model.apply(
                {"params": params},
                jnp.asarray(x),
                jnp.asarray(t),
                jnp.asarray(ctx),
                jnp.asarray(mask.astype(np.int32)),
            )
        )
        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x),
                timestep=torch.from_numpy(t),
                encoder_hidden_states=torch.from_numpy(ctx),
                encoder_attention_mask=torch.from_numpy(mask),
                enable_temporal_attentions=False,
                return_dict=False,
            )[0].numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)
