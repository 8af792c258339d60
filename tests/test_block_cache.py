"""Block-cache sampling (`latte_tpu/core/block_cache.py`).

The approximation is opt-in and quality-guarded at bench time; what the
tests pin down is the EXACTNESS of the machinery:

- the staging split is exact: a partial forward resumed from the full
  forward's pair-k activation reproduces the full forward's output
- cache_interval=1 reproduces the standard sampler exactly
- CFG composes (the 4-channel reference quirk)
- interval>1 runs finite and actually skips work (differs from exact)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latte_tpu.core.block_cache import _slice_back_params, cached_sample_loop
from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.core.samplers import ddim_sample_loop
from latte_tpu.models import Latte

K = 2  # cached front pairs (of 4)


@pytest.fixture(scope="module")
def setup():
    model = Latte(
        input_size=8,
        patch_size=2,
        hidden_size=32,
        depth=8,
        num_heads=2,
        num_frames=2,
        extras=2,
        num_classes=10,
        attention_mode="xla",
    )
    x = jnp.zeros((1, 2, 4, 8, 8))
    rngs = {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32))
    keys = iter(jax.random.split(jax.random.PRNGKey(2), 10_000))
    params = {
        "params": jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, jnp.float32),
            variables["params"],
        )
    }
    return model, params


def test_staging_split_is_exact(setup, rng_np):
    model, params = setup
    x = jnp.asarray(rng_np.standard_normal((2, 2, 4, 8, 8)).astype(np.float32))
    t = jnp.array([3, 400], jnp.int32)
    y = jnp.array([1, 7], jnp.int32)

    out_ref = model.apply(params, x, t, y=y)
    out_full, front = model.apply(params, x, t, y=y, return_front=K)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_ref))
    assert front.shape == (4, 16, 32)  # (B*F, T, D)
    assert not np.allclose(np.asarray(front), 0.0)

    p_back = _slice_back_params(params, K)
    stacked = p_back["params"]["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
    assert stacked.shape[0] == 2  # 4 pairs - K
    out_partial = model.apply(
        p_back, x, t, y=y, front_state=front, start_pair=K
    )
    np.testing.assert_array_equal(np.asarray(out_partial), np.asarray(out_full))


def test_interval_one_matches_standard_sampler(setup, rng_np):
    model, params = setup
    diffusion = create_diffusion("ddim5")
    z = jnp.asarray(rng_np.standard_normal((1, 2, 4, 8, 8)).astype(np.float32))
    y = jnp.array([3], jnp.int32)

    exact = ddim_sample_loop(
        diffusion,
        lambda xx, tt, **kw: model.apply(params, xx, tt, **kw),
        z,
        model_kwargs={"y": y},
    )
    cached = cached_sample_loop(
        diffusion, model, params, z,
        cache_pairs=K, cache_interval=1, y=y, cfg_scale=1.0,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(exact), rtol=1e-6, atol=1e-6
    )


def test_interval_one_matches_cfg_sampler(setup, rng_np):
    from latte_tpu.core.samplers import cfg_model_fn

    model, params = setup
    diffusion = create_diffusion("ddim4")
    z = jnp.asarray(rng_np.standard_normal((2, 2, 4, 8, 8)).astype(np.float32))
    y = jnp.array([3, 10], jnp.int32)  # cond | null halves

    apply_cfg = lambda xx, tt, **kw: model.apply(
        params, xx, tt, cfg_scale=4.0, method=model.forward_with_cfg, **kw
    )
    exact = ddim_sample_loop(diffusion, apply_cfg, z, model_kwargs={"y": y})
    cached = cached_sample_loop(
        diffusion, model, params, z,
        cache_pairs=K, cache_interval=1, y=y, cfg_scale=4.0,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(exact), rtol=1e-6, atol=1e-6
    )


def test_interval_two_runs_and_approximates(setup, rng_np):
    model, params = setup
    diffusion = create_diffusion("ddim6")
    z = jnp.asarray(rng_np.standard_normal((1, 2, 4, 8, 8)).astype(np.float32))

    y = jnp.array([3], jnp.int32)
    exact = cached_sample_loop(
        diffusion, model, params, z, cache_pairs=K, cache_interval=1, y=y,
    )
    approx = cached_sample_loop(
        diffusion, model, params, z, cache_pairs=K, cache_interval=2, y=y,
    )
    a = np.asarray(approx, np.float64)
    assert np.isfinite(a).all()
    assert a.shape == exact.shape
    # it must actually skip (different trajectory)...
    assert not np.allclose(a, np.asarray(exact))
    # ...but stay in the same regime (the approximation, not garbage)
    e = np.asarray(exact, np.float64)
    cos = (a * e).sum() / (np.linalg.norm(a) * np.linalg.norm(e) + 1e-12)
    assert cos > 0.9, cos


def test_validation_errors(setup):
    model, params = setup
    diffusion = create_diffusion("ddim2")
    z = jnp.zeros((1, 2, 4, 8, 8))
    y = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="cache_pairs"):
        cached_sample_loop(
            diffusion, model, params, z, cache_pairs=0, cache_interval=2, y=y
        )
    with pytest.raises(ValueError, match="cache_pairs"):
        cached_sample_loop(
            diffusion, model, params, z, cache_pairs=4, cache_interval=2, y=y
        )
    with pytest.raises(ValueError, match="cache_interval"):
        cached_sample_loop(
            diffusion, model, params, z, cache_pairs=1, cache_interval=0, y=y
        )
    with pytest.raises(ValueError, match="exclusive"):
        model.apply(
            params, z, jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32),
            return_front=1, front_state=jnp.zeros((2, 16, 32)), start_pair=1,
        )


class TestT2VBlockCache:
    """Block-cache staging + pipeline wiring for LatteT2V."""

    @pytest.fixture(scope="class")
    def t2v(self):
        from latte_tpu.models.t2v import LatteT2V

        model = LatteT2V(
            num_attention_heads=2,
            attention_head_dim=8,
            num_layers=3,
            patch_size=2,
            sample_size=4,
            cross_attention_dim=16,
            caption_channels=64,
            video_length=4,
            attention_mode="xla",
        )
        x = jnp.zeros((1, 4, 4, 8, 8))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 10, 64))
        params = model.init({"params": jax.random.PRNGKey(0)}, x, t, ctx, None)
        return model, params

    def test_t2v_staging_split_is_exact(self, t2v, rng_np):
        from latte_tpu.core.block_cache import _slice_back_params

        model, params = t2v
        k = 2
        x = jnp.asarray(rng_np.standard_normal((1, 4, 4, 8, 8)).astype(np.float32))
        t = jnp.array([37], jnp.float32)
        ctx = jnp.asarray(rng_np.standard_normal((1, 10, 64)).astype(np.float32))

        out_ref = model.apply(params, x, t, ctx, None)
        out_full, front = model.apply(params, x, t, ctx, None, return_front=k)
        np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_ref))
        assert front.shape == (4, 16, 16)  # (B*F, T, D)

        out_partial = model.apply(
            _slice_back_params(params, k), x, t, ctx, None,
            front_state=front, start_pair=k,
        )
        np.testing.assert_array_equal(np.asarray(out_partial), np.asarray(out_full))

    def test_t2v_pipeline_interval_one_matches_plain(self, t2v):
        from latte_tpu.core.scheduler import get_scheduler
        from latte_tpu.sample.pipeline_t2v import LattePipeline
        from test_pipeline_t2v import FakeTextEncoder

        model, params = t2v
        mk = lambda **kw: LattePipeline(
            transformer=model,
            transformer_params=params,
            scheduler=get_scheduler("DDIM"),
            text_encoder=FakeTextEncoder(),
            vae_spatial_scale=2,  # height/width 8 -> 4x4 latents
            **kw,
        )
        common = dict(
            video_length=4, height=8, width=8, num_inference_steps=3,
            guidance_scale=3.0, seed=0, output_type="latents",
        )
        plain = mk()(["a cat"], **common).video
        bc1 = mk(block_cache_interval=1)  # interval 1 rejected? no: >1 gate
        # interval=1 means "off" at the pipeline level (no bc path taken)
        np.testing.assert_array_equal(
            bc1(["a cat"], **common).video, plain
        )
        bc2 = mk(block_cache_interval=2, block_cache_pairs=2)
        out2 = bc2(["a cat"], **common).video
        assert out2.shape == plain.shape
        assert np.isfinite(out2).all()
        assert not np.allclose(out2, plain)  # it actually skipped work

    def test_t2v_pipeline_rejects_bad_pairs(self, t2v):
        from latte_tpu.core.scheduler import get_scheduler
        from latte_tpu.sample.pipeline_t2v import LattePipeline
        from test_pipeline_t2v import FakeTextEncoder

        model, params = t2v
        with pytest.raises(ValueError, match="block_cache_pairs"):
            LattePipeline(
                transformer=model,
                transformer_params=params,
                scheduler=get_scheduler("DDIM"),
                text_encoder=FakeTextEncoder(),
                block_cache_interval=2,
                block_cache_pairs=3,
            )


def test_interval_one_matches_standard_ddpm_sampler(setup, rng_np):
    """The stochastic (DDPM) mode shares _noise_for's fold-by-timestep rng
    convention, so interval=1 must reproduce p_sample_loop exactly."""
    from latte_tpu.core.samplers import p_sample_loop

    model, params = setup
    diffusion = create_diffusion("4")
    z = jnp.asarray(rng_np.standard_normal((1, 2, 4, 8, 8)).astype(np.float32))
    y = jnp.array([6], jnp.int32)
    rng = jax.random.PRNGKey(17)

    exact = p_sample_loop(
        diffusion,
        lambda xx, tt, **kw: model.apply(params, xx, tt, **kw),
        z,
        rng=rng,
        model_kwargs={"y": y},
    )
    cached = cached_sample_loop(
        diffusion, model, params, z,
        cache_pairs=K, cache_interval=1, y=y,
        sample_method="ddpm", rng=rng,
    )
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(exact), rtol=1e-6, atol=1e-6
    )
