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
