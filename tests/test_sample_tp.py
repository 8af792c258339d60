"""Tensor-parallel serving through `sample.build_sample_fn`.

tp>1 splits attention heads / MLP columns over the first tp devices
(Megatron rules, `dist/sharding.py`) for single-sample latency scaling;
latents must match the single-device sampler.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latte_tpu.config.loader import Config
from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_model
from latte_tpu.sample.sample import build_sample_fn


def _setup(extras=2):
    cfg = Config(
        {
            "model": "Latte-S/2",
            "extras": extras,
            "num_frames": 2,
            "image_size": 16,
            "sample_method": "ddim",
            "num_sampling_steps": 4,
            "cfg_scale": 2.0 if extras == 2 else 1.0,
        }
    )
    model = get_model(
        "Latte-S/2",
        input_size=2,
        num_frames=2,
        extras=extras,
        num_classes=10,
        attention_mode="xla",
        hidden_size=32,
        depth=4,
        num_heads=2,
        patch_size=1,
    )
    diffusion = create_diffusion("4", diffusion_steps=40)
    x = jnp.zeros((1, 2, 4, 2, 2))
    rngs = {"params": jax.random.PRNGKey(0)}
    kw = {}
    if extras == 2:
        rngs["label_dropout"] = jax.random.PRNGKey(1)
        kw["y"] = jnp.zeros((1,), jnp.int32)
    params = model.init(rngs, x, jnp.zeros((1,), jnp.int32), **kw)
    return cfg, model, diffusion, params


class TestTpServing:
    def test_tp2_matches_single_device_cfg(self):
        cfg, model, diffusion, params = _setup(extras=2)
        rng = jax.random.PRNGKey(7)
        # CFG doubles the batch: cond + null-class halves
        z = jnp.concatenate([jax.random.normal(rng, (1, 2, 4, 2, 2))] * 2, axis=0)
        y = jnp.array([3, 10], jnp.int32)

        ref_fn, use_cfg = build_sample_fn(model, params, cfg, diffusion)
        assert use_cfg
        want = np.asarray(ref_fn(z, y, rng))

        cfg_tp = Config({**cfg.to_dict(), "tensor_parallel": 2})
        tp_fn, _ = build_sample_fn(model, params, cfg_tp, diffusion)
        got = np.asarray(tp_fn(z, y, rng))
        # tp reorders the psum reductions — allclose, not bit-equal
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_tp2_unconditional_y_none(self):
        """y=None must thread through the tp in_shardings (empty pytree)."""
        cfg, model, diffusion, params = _setup(extras=1)
        z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 2, 2))
        rng = jax.random.PRNGKey(1)
        ref_fn, _ = build_sample_fn(model, params, cfg, diffusion)
        want = np.asarray(ref_fn(z, None, rng))
        cfg_tp = Config({**cfg.to_dict(), "tensor_parallel": 2})
        tp_fn, _ = build_sample_fn(model, params, cfg_tp, diffusion)
        got = np.asarray(tp_fn(z, None, rng))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_tp_host_mode_rejected(self):
        cfg, model, diffusion, params = _setup(extras=1)
        cfg_bad = Config(
            {**cfg.to_dict(), "tensor_parallel": 2, "loop_mode": "host"}
        )
        with pytest.raises(ValueError, match="loop_mode=scan"):
            build_sample_fn(model, params, cfg_bad, diffusion)

    def test_tp_weights_actually_split(self):
        cfg, model, diffusion, params = _setup(extras=1)
        cfg_tp = Config({**cfg.to_dict(), "tensor_parallel": 4})
        fn, _ = build_sample_fn(model, params, cfg_tp, diffusion)
        # the Megatron column split must actually land on the block qkv
        qkv = fn.tp_params["params"]["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
        assert not qkv.sharding.is_fully_replicated, qkv.sharding
        assert fn.tp_mesh.shape["tp"] == 4
        z = jnp.zeros((1, 2, 4, 2, 2))
        out = fn(z, None, jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out)).all()

    def test_tp2_block_cache_matches_single_device(self):
        """Block-cache × tp composition: the tp=2 cond-staged cached
        sampler must reproduce the single-device cached sampler (with CFG,
        the harder path — the cond-staged forward under the Megatron
        split)."""
        cfg, model, diffusion, params = _setup(extras=2)
        rng = jax.random.PRNGKey(11)
        z = jnp.concatenate([jax.random.normal(rng, (1, 2, 4, 2, 2))] * 2, axis=0)
        y = jnp.array([3, 10], jnp.int32)

        bc = {"block_cache_interval": 2, "block_cache_pairs": 1}
        ref_fn, use_cfg = build_sample_fn(
            model, params, Config({**cfg.to_dict(), **bc}), diffusion
        )
        assert use_cfg
        want = np.asarray(ref_fn(z, y, rng))

        cfg_tp = Config({**cfg.to_dict(), **bc, "tensor_parallel": 2})
        tp_fn, _ = build_sample_fn(model, params, cfg_tp, diffusion)
        # the Megatron split must actually land on the cached path's params
        qkv = tp_fn.tp_params["params"]["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
        assert not qkv.sharding.is_fully_replicated, qkv.sharding
        got = np.asarray(tp_fn(z, y, rng))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_sample_many_ignores_tensor_parallel(self):
        """allow_tp=False callers (sample_many's dp BatchGenerator) must
        get the plain jitted sampler even when the config carries
        tensor_parallel."""
        cfg, model, diffusion, params = _setup(extras=1)
        cfg_tp = Config({**cfg.to_dict(), "tensor_parallel": 2})
        fn, _ = build_sample_fn(model, params, cfg_tp, diffusion, allow_tp=False)
        assert not hasattr(fn, "tp_params")
        z = jnp.zeros((1, 2, 4, 2, 2))
        out = fn(z, None, jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out)).all()
