"""Config system, utils, and end-to-end sampling entry-point smoke tests."""

import os

import numpy as np
import pytest

from latte_tpu.config import Config, load_config
from latte_tpu.config.loader import apply_overrides, save_config
from latte_tpu.utils import (
    clean_caption,
    create_experiment_dir,
    read_video,
    save_video,
    save_video_grid,
    to_uint8,
)


class TestConfig:
    def test_load_and_attr_access(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("model: Latte-S/2\nnested:\n  a: 1\nlr: 1.0e-4\n")
        cfg = load_config(str(p))
        assert cfg.model == "Latte-S/2"
        assert cfg.nested.a == 1
        assert cfg.lr == 1e-4
        assert getattr(cfg, "missing_key", None) is None

    def test_overrides(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: 1\nnested:\n  b: 2\n")
        cfg = load_config(str(p), ["a=5", "nested.b=7", "new.deep.key=true"])
        assert cfg.a == 5 and cfg.nested.b == 7 and cfg.new.deep.key is True

    def test_save_roundtrip(self, tmp_path):
        cfg = Config({"x": 1, "y": {"z": "s"}})
        save_config(cfg, str(tmp_path / "out.yaml"))
        cfg2 = load_config(str(tmp_path / "out.yaml"))
        assert cfg2.x == 1 and cfg2.y.z == "s"

    def test_repo_configs_parse(self):
        for rel in (
            "configs/ffs/ffs_train.yaml",
            "configs/ffs/ffs_sample.yaml",
            "configs/ucf101/ucf101_sample.yaml",
            "configs/t2x/t2v_sample.yaml",
        ):
            cfg = load_config(os.path.join(os.path.dirname(__file__), "..", rel))
            assert cfg.model


class TestUtils:
    def test_video_roundtrip(self, tmp_path):
        v = (np.random.default_rng(0).random((6, 32, 32, 3)) * 255).astype(np.uint8)
        path = str(tmp_path / "v.mp4")
        save_video(path, v, fps=8)
        back = read_video(path)
        assert back.shape == v.shape
        # lossy codec: just check gross correlation
        assert np.corrcoef(v.ravel(), back.ravel())[0, 1] > 0.5

    def test_video_grid(self, tmp_path):
        vids = np.zeros((3, 4, 16, 16, 3), np.uint8)
        path = str(tmp_path / "grid.mp4")
        save_video_grid(path, vids, fps=4)
        back = read_video(path)
        assert back.shape == (4, 32, 32, 3)  # 2x2 grid with padding

    def test_to_uint8(self):
        x = np.array([-1.0, 0.0, 1.0])
        np.testing.assert_array_equal(to_uint8(x), [0, 127, 255])

    def test_experiment_dir_increments(self, tmp_path):
        cfg = Config({"model": "Latte-S/2", "gradient_checkpointing": True})
        d1 = create_experiment_dir(str(tmp_path), cfg)
        d2 = create_experiment_dir(str(tmp_path), cfg)
        assert os.path.basename(d1).startswith("000-Latte-S-2")
        assert os.path.basename(d2).startswith("001-")
        assert "gc" in d1

    def test_clean_caption(self):
        assert clean_caption("Hello <person> WORLD!! http://x.com/abc") == "hello person world!!"
        assert clean_caption("a   b") == "a b"


class TestSampleEntry:
    def _tiny_cfg(self, tmp_path, **kw):
        cfg = Config(
            {
                "model": "Latte-S/2",
                "image_size": 64,
                "num_frames": 4,
                "extras": 1,
                "learn_sigma": True,
                "attention_mode": "xla",
                "num_sampling_steps": "ddim5",
                "sample_method": "ddim",
                "seed": 0,
                "save_video_path": str(tmp_path / "out.mp4"),
            }
        )
        cfg.update(kw)
        return cfg

    def test_sample_main_latents(self, tmp_path):
        from latte_tpu.sample.sample import main

        out = main(self._tiny_cfg(tmp_path))
        assert out.endswith("_latents.npz")
        latents = np.load(out)["latents"]
        assert latents.shape == (1, 4, 4, 8, 8)
        assert np.isfinite(latents).all()

    def test_sample_main_cfg_classcond(self, tmp_path):
        from latte_tpu.sample.sample import main

        cfg = self._tiny_cfg(
            tmp_path, extras=2, num_classes=10, cfg_scale=4.0, sample_class=3
        )
        out = main(cfg)
        latents = np.load(out)["latents"]
        assert latents.shape == (1, 4, 4, 8, 8)

    def test_sample_many(self, tmp_path):
        from latte_tpu.sample.sample_many import main

        cfg = self._tiny_cfg(tmp_path)
        cfg.save_video_path = str(tmp_path / "many")
        cfg.per_proc_batch_size = 1
        cfg.num_fvd_samples = 16  # 8 devices * 1 -> 2 iterations
        out_dir = main(cfg)
        files = sorted(os.listdir(out_dir))
        assert len(files) == 16
        assert files[0] == "0000.npz" and files[-1] == "0015.npz"

    def test_sample_main_host_loop_matches_scan(self, tmp_path):
        """loop_mode=host must produce identical latents to scan mode."""
        from latte_tpu.sample.sample import main

        out_scan = np.load(main(self._tiny_cfg(tmp_path)))["latents"]
        cfg = self._tiny_cfg(tmp_path, loop_mode="host")
        cfg.save_video_path = str(tmp_path / "host.mp4")
        out_host = np.load(main(cfg))["latents"]
        np.testing.assert_allclose(out_host, out_scan, rtol=1e-5, atol=1e-6)
