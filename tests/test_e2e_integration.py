"""End-to-end slice: real (tiny) mp4 dataset on disk -> train loop with
fused VAE encode -> orbax checkpoint -> sampling from that checkpoint ->
FVD metric over video dirs. Exercises every layer together."""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

from latte_tpu.config import Config
from latte_tpu.utils import save_video


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(0)
    for i in range(6):
        v = (rng.random((12, 32, 32, 3)) * 255).astype(np.uint8)
        save_video(str(d / f"{i:03d}.mp4"), v, fps=8)
    return str(d)


@pytest.fixture(scope="module")
def vae_ckpt(tmp_path_factory):
    """Tiny VAE (f2) params saved as an orbax dir."""
    import jax.numpy as jnp

    from latte_tpu.vae.autoencoder_kl import tiny_vae

    vae = tiny_vae()
    variables = vae.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3, 32, 32)))
    path = str(tmp_path_factory.mktemp("ckpts") / "vae")
    ocp.PyTreeCheckpointer().save(path, jax.device_get(variables["params"]))
    return path


def _tiny_build_encode_fn(config):
    """build_encode_fn twin using the tiny (f2) test VAE."""
    import jax.numpy as jnp

    from latte_tpu.vae.autoencoder_kl import tiny_vae

    vae_ckpt = getattr(config, "vae_ckpt", None)
    if not vae_ckpt or not os.path.exists(str(vae_ckpt)):
        return None
    vae = tiny_vae()
    vae_params = {"params": ocp.PyTreeCheckpointer().restore(os.path.abspath(vae_ckpt))}

    def encode(video, rng, params):
        B, F = video.shape[:2]
        flat = video.reshape(B * F, *video.shape[2:])
        post = vae.apply(params, flat, method=vae.encode)
        z = post.sample(rng) * 0.18215
        return z.reshape(B, F, *z.shape[1:])

    return encode, vae_params


class TestEndToEnd:
    def test_full_slice(self, video_dir, vae_ckpt, tmp_path, monkeypatch):
        # --- train on the real mp4 directory with fused VAE encoding ---
        import latte_tpu.train.train as train_mod

        monkeypatch.setattr(train_mod, "build_encode_fn", _tiny_build_encode_fn)

        cfg = Config(
            {
                "dataset": "ffs",
                "data_path": video_dir,
                "results_dir": str(tmp_path / "results"),
                "model": "Latte-S/2",
                "image_size": 32,  # dataset reads 32px; tiny VAE is f2
                "latent_size": 16,  # -> 16x16 latents for the model
                "num_frames": 4,
                "frame_interval": 1,
                "extras": 1,
                "attention_mode": "xla",
                "local_batch_size": 1,
                "max_train_steps": 2,
                "log_every": 2,
                "ckpt_every": 2,
                "num_workers": 2,
                "vae_ckpt": vae_ckpt,
                "global_seed": 0,
            }
        )
        out = train_mod.main(cfg)
        assert np.isfinite(out["loss"])
        ckpts = os.path.join(out["experiment_dir"], "checkpoints")
        assert os.listdir(ckpts)

        # --- sample from the saved checkpoint ---
        from latte_tpu.sample.sample import main as sample_main

        latest = sorted(os.listdir(ckpts))[-1]
        sample_cfg = Config(
            {
                "model": "Latte-S/2",
                "image_size": 32,
                "latent_size": 16,
                "num_frames": 4,
                "extras": 1,
                "attention_mode": "xla",
                "num_sampling_steps": "ddim3",
                "sample_method": "ddim",
                "seed": 0,
                "ckpt": os.path.join(ckpts, latest),
                "save_video_path": str(tmp_path / "gen" / "out.mp4"),
            }
        )
        out_path = sample_main(sample_cfg)
        latents = np.load(out_path)["latents"]
        assert latents.shape == (1, 4, 4, 16, 16)
        assert np.isfinite(latents).all()

        # --- W8A8 int8 serving from the same checkpoint ---
        sample_cfg.update(
            {"quantized": True, "save_video_path": str(tmp_path / "gen" / "q.mp4")}
        )
        q_latents = np.load(sample_main(sample_cfg))["latents"]
        assert q_latents.shape == latents.shape
        assert np.isfinite(q_latents).all()

        # --- static-scale W8A8 (CLI-side calibration) ---
        sample_cfg.update(
            {"quantized": "static", "save_video_path": str(tmp_path / "gen" / "qs.mp4")}
        )
        qs_latents = np.load(sample_main(sample_cfg))["latents"]
        assert qs_latents.shape == latents.shape
        assert np.isfinite(qs_latents).all()

        # --- metric over real video dirs (fake detector) ---
        from latte_tpu.eval.metrics import calc_metric

        def fake_detector(x, **kw):
            b = x.shape[0]
            flat = x.reshape(b, -1).astype(np.float64)
            proj = np.random.default_rng(7).standard_normal((flat.shape[1], 8))
            return (flat @ proj / flat.shape[1]).astype(np.float32)

        rec = calc_metric(
            "fvd2048_16f",
            real_path=video_dir,
            fake_path=video_dir,
            detector=fake_detector,
            max_real=4,
            max_fake=4,
            num_frames=4,
        )
        assert np.isfinite(rec["results"]["fvd2048_16f"])
