"""Full training-loop entry point smoke tests (synthetic data, CPU mesh)."""

import os

import numpy as np

from latte_tpu.config import Config


def tiny_train_cfg(tmp_path, **kw):
    cfg = Config(
        {
            "dataset": "ffs",
            "data_path": "/nonexistent",  # -> synthetic batches
            "results_dir": str(tmp_path / "results"),
            "model": "Latte-S/2",
            "image_size": 64,
            "num_frames": 4,
            "learn_sigma": True,
            "extras": 1,
            "attention_mode": "xla",
            "learning_rate": 1e-4,
            "local_batch_size": 1,
            "max_train_steps": 6,
            "log_every": 3,
            "ckpt_every": 5,
            "global_seed": 0,
            "clip_max_norm": 0.1,
            "start_clip_iter": 2,
        }
    )
    cfg.update(kw)
    return cfg


class TestTrainLoop:
    def test_runs_and_checkpoints(self, tmp_path):
        from latte_tpu.train.train import main

        out = main(tiny_train_cfg(tmp_path))
        assert out["final_step"] == 6
        assert np.isfinite(out["loss"])
        exp = out["experiment_dir"]
        assert os.path.exists(os.path.join(exp, "config.yaml"))
        ckpts = os.listdir(os.path.join(exp, "checkpoints"))
        assert "0000005" in ckpts and "0000006" in ckpts

    def test_loss_aware_schedule_sampler_wired_into_cli(self, tmp_path):
        from latte_tpu.train.train import main

        out = main(
            tiny_train_cfg(
                tmp_path, schedule_sampler="loss-second-moment", max_train_steps=4,
                ckpt_every=100, log_every=2,
            )
        )
        assert out["final_step"] == 4
        assert np.isfinite(out["loss"])

    def test_resume(self, tmp_path):
        from latte_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
        from latte_tpu.train.train import main

        out = main(tiny_train_cfg(tmp_path))
        ckpt = latest_checkpoint(os.path.join(out["experiment_dir"], "checkpoints"))
        payload = load_checkpoint(ckpt)
        assert int(payload["step"]) == 6
        # resume and run 2 more steps
        cfg = tiny_train_cfg(tmp_path, max_train_steps=8, resume_from_checkpoint=ckpt)
        out2 = main(cfg)
        ckpts = os.listdir(os.path.join(out2["experiment_dir"], "checkpoints"))
        assert "0000008" in ckpts

    def test_async_save_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from latte_tpu.train.checkpoint import (
            load_checkpoint,
            save_checkpoint,
            wait_for_saves,
        )
        from latte_tpu.train.state import create_train_state, make_optimizer

        params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros((4,))}
        state = create_train_state(params, make_optimizer(lr=1e-3, warmup_steps=0))
        path = save_checkpoint(str(tmp_path / "ckpt" / "0000001"), state, block=False)
        # donation-safety: deleting the device buffers right after save()
        # returns must not corrupt the write (data was snapshotted to host)
        jax.tree_util.tree_map(
            lambda a: a.delete() if isinstance(a, jax.Array) else None, state.params
        )
        wait_for_saves()
        payload = load_checkpoint(path)
        np.testing.assert_allclose(payload["params"]["w"][0, 0], 0.0)
        np.testing.assert_allclose(
            payload["params"]["w"], np.arange(12.0).reshape(3, 4)
        )
        jax.tree_util.tree_map(  # full-tree equality incl. opt state
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            jax.device_get(
                {"params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.zeros((4,))}}
            )["params"],
            payload["params"],
        )

    def test_fsdp_loop(self, tmp_path):
        # ZeRO-3 through the CLI path: fsdp: true on the 8-virtual-device
        # mesh; loss finite, checkpoint written and loadable
        from latte_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, fsdp=True, max_train_steps=3, log_every=3, ckpt_every=3
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])
        ckpt = latest_checkpoint(os.path.join(out["experiment_dir"], "checkpoints"))
        payload = load_checkpoint(ckpt)
        assert int(payload["step"]) == 3

    def test_class_conditional_loop(self, tmp_path):
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, extras=2, num_classes=5, max_train_steps=3, log_every=3, ckpt_every=100
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])


class TestTensorParallelTraining:
    def test_tp2_loop_runs(self, tmp_path):
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, tensor_parallel=2, max_train_steps=2, log_every=2, ckpt_every=100
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])


class TestZero1Training:
    def test_zero1_loop_runs(self, tmp_path):
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, zero1=True, max_train_steps=2, log_every=2, ckpt_every=100
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])

    def test_zero1_with_tp(self, tmp_path):
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, zero1=True, tensor_parallel=2, max_train_steps=2,
            log_every=2, ckpt_every=100,
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])


class TestPipelineParallelTraining:
    def test_pp2_loop_runs_and_checkpoints(self, tmp_path):
        # dp=4 x pp=2 on the 8-virtual-device mesh through the CLI path;
        # the pp-sharded state must also round-trip a checkpoint
        from latte_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, pipeline_parallel=2, pp_microbatches=2,
            max_train_steps=2, log_every=2, ckpt_every=2,
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])
        ckpt = latest_checkpoint(os.path.join(out["experiment_dir"], "checkpoints"))
        payload = load_checkpoint(ckpt)
        assert int(payload["step"]) == 2

    def test_pp2_class_conditional_zero1(self, tmp_path):
        # extras=2 exercises train-mode CFG label dropout through the
        # pipelined forward; zero1 composes dp moment sharding on top
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, pipeline_parallel=2, extras=2, num_classes=5,
            zero1=True, max_train_steps=2, log_every=2, ckpt_every=100,
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])

    def test_pp2_joint_image_batches(self, tmp_path):
        # use_image_num joint batches (LatteIMG + y_image) through the
        # pipelined step
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, model="LatteIMG-S/2", pipeline_parallel=2, extras=2,
            num_classes=5, use_image_num=2, max_train_steps=2, log_every=2,
            ckpt_every=100,
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])

    def test_pp_rejects_incompatible_knobs(self, tmp_path):
        import pytest

        from latte_tpu.train.train import main

        with pytest.raises(ValueError, match="pipeline_parallel"):
            main(tiny_train_cfg(tmp_path, pipeline_parallel=2, tensor_parallel=2))
        with pytest.raises(ValueError, match="fsdp"):
            main(tiny_train_cfg(tmp_path, pipeline_parallel=2, fsdp=True))


class TestGradAccumLoop:
    def test_grad_accum_cli(self, tmp_path):
        # gradient_accumulation_steps (the reference's TODO knob) through
        # the real CLI: 2 chunks per optimizer step
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, local_batch_size=2, gradient_accumulation_steps=2,
            max_train_steps=2, log_every=2, ckpt_every=100,
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])


class TestQuantTrainLoop:
    def test_quant_train_cli(self, tmp_path):
        # quant_train: true — int8 QAT forward through the real train CLI
        from latte_tpu.train.train import main

        cfg = tiny_train_cfg(
            tmp_path, quant_train=True, max_train_steps=2, log_every=2,
            ckpt_every=100,
        )
        out = main(cfg)
        assert np.isfinite(out["loss"])


class TestPixelPath:
    """Real-pixel input paths: fused VAE encode, uint8 transport, and the
    synthetic-pixel control stream used for input-pipeline benchmarking."""

    def test_synthetic_pixel_control_loop(self, tmp_path):
        from latte_tpu.train.train import main

        out = main(
            tiny_train_cfg(
                tmp_path, synthetic_kind="pixels", vae_ckpt="random",
                max_train_steps=2, log_every=1, ckpt_every=100,
            )
        )
        assert out["final_step"] == 2
        assert np.isfinite(out["loss"])

    def test_uint8_transport_matches_float32(self, tmp_path):
        """Same seed + single worker: the uint8-transported run must track
        the float32 run to quantization tolerance (ffs stack resizes, so
        not bit-exact; see data/loader.quantize_video_u8)."""
        from latte_tpu.train.train import main
        from latte_tpu.utils import save_video

        d = tmp_path / "vids"
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            save_video(
                str(d / f"c{i}.mp4"),
                (rng.random((12, 72, 96, 3)) * 255).astype(np.uint8),
                fps=8,
            )
        losses = {}
        for transport in ("uint8", "float32"):
            out = main(
                tiny_train_cfg(
                    tmp_path,
                    data_path=str(d),
                    vae_ckpt="random",
                    pixel_transport=transport,
                    num_workers=1,
                    frame_interval=1,
                    max_train_steps=2,
                    log_every=1,
                    ckpt_every=100,
                    results_dir=str(tmp_path / f"res_{transport}"),
                )
            )
            losses[transport] = out["loss"]
        assert np.isfinite(losses["uint8"]) and np.isfinite(losses["float32"])
        assert abs(losses["uint8"] - losses["float32"]) < 0.05 * (
            abs(losses["float32"]) + 1e-3
        )
