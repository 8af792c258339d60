"""sample_t2x entry-point smoke test (tiny model, stub T5, no VAE)."""

import os

import numpy as np

from latte_tpu.config import Config


class TestSampleT2X:
    def test_t2v_smoke(self, tmp_path):
        from latte_tpu.sample.sample_t2x import main

        cfg = Config(
            {
                "model": "LatteT2V",
                "video_length": 4,
                "image_size": [32, 32],
                "num_attention_heads": 2,
                "attention_head_dim": 8,
                "num_layers": 2,
                "caption_channels": 32,
                "cross_attention_dim": 16,
                "sample_method": "DDIM",
                "num_sampling_steps": 2,
                "guidance_scale": 7.5,
                "seed": 0,
                "enable_temporal_attentions": True,
                "enable_vae_temporal_decoder": False,
                "text_prompt": ["a cat", "a dog"],
                "save_video_path": str(tmp_path / "t2v"),
            }
        )
        out_dir = main(cfg)
        files = sorted(os.listdir(out_dir))
        assert len(files) == 2
        latents = np.load(os.path.join(out_dir, files[0]))["latents"]
        assert latents.shape == (1, 4, 4, 4, 4)
        assert np.isfinite(latents).all()

    def test_t2v_smoke_pipeline_parallel(self, tmp_path):
        """pipeline_parallel=2: the CLI serves the transformer depth-sharded
        over a pp mesh; output must match the single-chip run exactly."""
        from latte_tpu.sample.sample_t2x import main

        base = {
            "model": "LatteT2V",
            "video_length": 4,
            "image_size": [32, 32],
            "num_attention_heads": 2,
            "attention_head_dim": 8,
            "num_layers": 2,
            "caption_channels": 32,
            "cross_attention_dim": 16,
            "sample_method": "DDIM",
            "num_sampling_steps": 2,
            "guidance_scale": 7.5,
            "seed": 0,
            "enable_temporal_attentions": True,
            "enable_vae_temporal_decoder": False,
            "text_prompt": ["a cat"],
        }
        ref_dir = main(Config({**base, "save_video_path": str(tmp_path / "ref")}))
        pp_dir = main(
            Config(
                {
                    **base,
                    "pipeline_parallel": 2,
                    "pp_microbatches": 2,
                    "save_video_path": str(tmp_path / "pp"),
                }
            )
        )
        ref = np.load(os.path.join(ref_dir, sorted(os.listdir(ref_dir))[0]))["latents"]
        out = np.load(os.path.join(pp_dir, sorted(os.listdir(pp_dir))[0]))["latents"]
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_t2v_smoke_quantized(self, tmp_path):
        """Same pipeline through the W8A8 int8 serving path."""
        from latte_tpu.sample.sample_t2x import main

        cfg = Config(
            {
                "model": "LatteT2V",
                "video_length": 4,
                "image_size": [32, 32],
                "num_attention_heads": 2,
                "attention_head_dim": 8,
                "num_layers": 2,
                "caption_channels": 32,
                "cross_attention_dim": 16,
                "sample_method": "DDIM",
                "num_sampling_steps": 2,
                "guidance_scale": 7.5,
                "seed": 0,
                "enable_temporal_attentions": True,
                "enable_vae_temporal_decoder": False,
                "text_prompt": ["a cat"],
                "quantized": True,
                "save_video_path": str(tmp_path / "t2v_q"),
            }
        )
        out_dir = main(cfg)
        files = sorted(os.listdir(out_dir))
        assert len(files) == 1
        latents = np.load(os.path.join(out_dir, files[0]))["latents"]
        assert np.isfinite(latents).all()
