"""Latent-cache training pipeline (VERDICT r3 item 6).

The cache stores posterior MOMENTS; the train step samples from them with
the same rng split/shape the fused-encode path uses — so given identical
moments, the loss is bit-identical to online encoding. Covered here:

- step-level equivalence: fused-VAE-encode loss == cached-moments loss on
  the same pixel batch and rng (fp tolerance)
- the full pipeline: cache CLI over a tiny mp4 dataset -> train.main from
  the cache dir (auto-detected via latent_cache.json)
- fresh posterior noise per step (the cache is moments, not samples)
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
import pytest

from latte_tpu.config import Config
from latte_tpu.utils import save_video


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(3)
    for i in range(4):
        v = (rng.random((10, 32, 32, 3)) * 255).astype(np.uint8)
        save_video(str(d / f"{i:03d}.mp4"), v, fps=8)
    return str(d)


@pytest.fixture(scope="module")
def vae_ckpt(tmp_path_factory):
    from latte_tpu.vae.autoencoder_kl import tiny_vae

    vae = tiny_vae()
    variables = vae.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3, 32, 32)))
    path = str(tmp_path_factory.mktemp("ckpts") / "vae")
    ocp.PyTreeCheckpointer().save(path, jax.device_get(variables["params"]))
    return path


def _tiny_encode_builders(config):
    """build_encode_fn twin over the tiny (f2) test VAE, with .raw."""
    from latte_tpu.vae.autoencoder_kl import tiny_vae

    vae = tiny_vae()
    vae_params = {
        "params": ocp.PyTreeCheckpointer().restore(os.path.abspath(config.vae_ckpt))
    }
    scale = float(getattr(config, "vae_scale", 0.18215))

    def encode(video, rng, params):
        B, F = video.shape[:2]
        flat = video.reshape(B * F, *video.shape[2:])
        post = vae.apply(params, flat, method=vae.encode)
        z = post.sample(rng) * scale
        return z.reshape(B, F, *z.shape[1:])

    encode.raw = lambda flat, params: vae.apply(params, flat, method=vae.encode)
    return encode, vae_params


def _tiny_model():
    from latte_tpu.models import get_model

    return get_model(
        "Latte-S/2", input_size=16, num_frames=4, extras=1,
        attention_mode="xla", hidden_size=32, depth=2, num_heads=2,
    )


def test_cached_step_loss_equals_fused_encode_loss(vae_ckpt):
    """THE equivalence claim: identical pixels + identical rng -> the
    cached-moments step reproduces the fused-encode step's loss."""
    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.train.state import create_train_state, make_optimizer
    from latte_tpu.train.step import make_train_step

    cfg = Config({"vae_ckpt": vae_ckpt, "vae_scale": 0.18215})
    encode, vae_params = _tiny_encode_builders(cfg)

    model = _tiny_model()
    diffusion = create_diffusion("", diffusion_steps=1000)
    opt = make_optimizer(lr=1e-4, weight_decay=0.0, warmup_steps=0)
    x0 = jnp.zeros((2, 4, 4, 16, 16))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((2,), jnp.int32)
    )["params"]

    rng = jax.random.PRNGKey(7)
    video = jax.random.uniform(
        jax.random.PRNGKey(9), (2, 4, 3, 32, 32), jnp.float32, -1.0, 1.0
    )

    # fused-encode step
    step_fused = make_train_step(
        model, diffusion, opt, extras=1, encode_fn=encode
    )
    state = create_train_state(params, opt)
    _, m_fused = step_fused(state, {"video": video}, rng, vae_params)

    # cached-moments step over the SAME pixels' offline moments
    post = encode.raw(video.reshape(8, 3, 32, 32), vae_params)
    batch = {
        "latent_mean": np.asarray(post.mean).reshape(2, 4, *post.mean.shape[1:]),
        "latent_std": np.asarray(post.std).reshape(2, 4, *post.std.shape[1:]),
    }
    step_cached = make_train_step(
        model, diffusion, opt, extras=1, vae_scale=0.18215
    )
    state = create_train_state(params, opt)
    _, m_cached = step_cached(state, batch, rng, None)

    np.testing.assert_allclose(
        float(m_cached["loss"]), float(m_fused["loss"]), rtol=1e-5
    )


def test_cache_cli_then_train_end_to_end(video_dir, vae_ckpt, tmp_path, monkeypatch):
    import latte_tpu.tools.cache_latents as cache_mod
    import latte_tpu.train.train as train_mod

    monkeypatch.setattr(train_mod, "build_encode_fn", _tiny_encode_builders)

    common = {
        "dataset": "ffs",
        "data_path": video_dir,
        "model": "Latte-S/2",
        "model_overrides": {"hidden_size": 32, "depth": 2, "num_heads": 2},
        "image_size": 32,  # tiny VAE is f2
        "latent_size": 16,
        "num_frames": 4,
        "frame_interval": 1,
        "extras": 1,
        "attention_mode": "xla",
        "local_batch_size": 2,
        "max_train_steps": 2,
        "log_every": 1,
        "ckpt_every": 100,
        "num_workers": 1,
        "vae_ckpt": vae_ckpt,
        "global_seed": 0,
        "cache_batch_size": 3,
    }
    cache_dir = str(tmp_path / "cache")
    cache_mod.main(Config(dict(common)), cache_dir)
    meta = json.load(open(os.path.join(cache_dir, "latent_cache.json")))
    assert meta["num_items"] == 4 and meta["frames"] == 4
    assert meta["latent_shape"] == [4, 16, 16]

    out = train_mod.main(
        Config({**common, "data_path": cache_dir,
                "results_dir": str(tmp_path / "results")})
    )
    assert out["final_step"] == 2
    assert np.isfinite(out["loss"])


def test_cached_step_samples_fresh_noise_each_call(vae_ckpt):
    """Two rngs over the same cached item -> different posterior samples
    (the cache is moments, not a frozen sample)."""
    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.train.state import create_train_state, make_optimizer
    from latte_tpu.train.step import make_train_step

    model = _tiny_model()
    diffusion = create_diffusion("", diffusion_steps=1000)
    opt = make_optimizer(lr=1e-4, weight_decay=0.0, warmup_steps=0)
    x0 = jnp.zeros((1, 4, 4, 16, 16))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((1,), jnp.int32)
    )["params"]
    step = make_train_step(model, diffusion, opt, extras=1, vae_scale=0.5)
    state = create_train_state(params, opt)
    batch = {
        "latent_mean": jnp.ones((1, 4, 4, 16, 16)) * 0.3,
        "latent_std": jnp.ones((1, 4, 4, 16, 16)) * 0.2,
    }
    _, m1 = step(state, batch, jax.random.PRNGKey(1), None)
    state = create_train_state(params, opt)
    _, m2 = step(state, batch, jax.random.PRNGKey(2), None)
    assert float(m1["loss"]) != float(m2["loss"])
