"""Trainer facade test."""

import numpy as np

from latte_tpu.config import Config
from latte_tpu.train.trainer import Trainer


def test_trainer_fit(tmp_path):
    cfg = Config(
        {
            "dataset": "ffs",
            "data_path": "/nonexistent",
            "results_dir": str(tmp_path),
            "model": "Latte-S/2",
            "image_size": 64,
            "num_frames": 2,
            "extras": 1,
            "attention_mode": "xla",
            "local_batch_size": 1,
            "global_seed": 0,
            "ckpt_every": 100,
        }
    )
    out = Trainer(max_steps=2, log_every=2).fit(cfg)
    assert out["final_step"] == 2
    assert np.isfinite(out["loss"])


def test_trainer_callbacks_and_early_stop(tmp_path):
    from latte_tpu.train.callbacks import Callback

    events = []

    class Recorder(Callback):
        def on_train_start(self, config, state, experiment_dir):
            events.append(("start", experiment_dir))

        def on_log(self, step, metrics):
            events.append(("log", step, metrics["loss"]))

        def on_checkpoint(self, step, path):
            events.append(("ckpt", step, path))

        def on_train_end(self, result):
            events.append(("end", result["final_step"]))

        def should_stop(self, step, metrics):
            return step >= 2  # stop at the first log boundary

    cfg = Config(
        {
            "dataset": "ffs",
            "data_path": "/nonexistent",
            "results_dir": str(tmp_path),
            "model": "Latte-S/2",
            "image_size": 64,
            "num_frames": 2,
            "extras": 1,
            "attention_mode": "xla",
            "local_batch_size": 1,
            "global_seed": 0,
            "ckpt_every": 100,
        }
    )
    out = Trainer(max_steps=10, log_every=2, callbacks=[Recorder()]).fit(cfg)
    assert out["final_step"] == 2  # early-stopped
    kinds = [e[0] for e in events]
    assert kinds[0] == "start"
    assert "log" in kinds and "ckpt" in kinds and kinds[-1] == "end"
    log_ev = next(e for e in events if e[0] == "log")
    assert log_ev[1] == 2 and np.isfinite(log_ev[2])
