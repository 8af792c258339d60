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


def _tiny_cfg(tmp_path, **extra):
    cfg = {
        "dataset": "ffs",
        "data_path": "/nonexistent",  # synthetic latents
        "results_dir": str(tmp_path),
        "model": "Latte-S/2",
        "model_overrides": {"hidden_size": 32, "depth": 2, "num_heads": 2},
        "image_size": 64,
        "num_frames": 2,
        "extras": 1,
        "attention_mode": "xla",
        "local_batch_size": 1,
        "global_seed": 0,
        "ckpt_every": 100,
        "async_checkpoint": False,
    }
    cfg.update(extra)
    return Config(cfg)


def test_trainer_resume_continues_from_checkpoint(tmp_path):
    """fit -> resume: the resumed run restores step/opt-state and trains
    on to the new max_steps (the reference's resume path is visibly broken
    — `/root/reference/train.py:188`; ours is the supported workflow)."""
    import os

    from latte_tpu.train.callbacks import Callback

    cfg = _tiny_cfg(tmp_path, ckpt_every=2)
    out = Trainer(max_steps=2, log_every=1).fit(cfg)
    ckpts = os.path.join(out["experiment_dir"], "checkpoints")
    latest = sorted(os.listdir(ckpts))[-1]
    assert latest == "0000002"

    logged_steps = []

    class Steps(Callback):
        def on_log(self, step, metrics):
            logged_steps.append(step)

    out2 = Trainer(max_steps=4, log_every=1, callbacks=[Steps()]).resume(
        cfg, os.path.join(ckpts, latest)
    )
    assert out2["final_step"] == 4
    assert logged_steps == [3, 4]  # resumed AT step 2, no replay
    assert np.isfinite(out2["loss"])
    # the final state checkpointed again at the new stop step
    ckpts2 = os.path.join(out2["experiment_dir"], "checkpoints")
    assert "0000004" in os.listdir(ckpts2)


def test_trainer_accepts_config_path_and_overrides_win(tmp_path):
    import yaml

    cfg = _tiny_cfg(tmp_path)
    cfg["max_train_steps"] = 50  # the Trainer override must beat this
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg.to_dict()))
    out = Trainer(max_steps=1, log_every=1).fit(str(path))
    assert out["final_step"] == 1


def test_early_stop_on_nan_semantics():
    from latte_tpu.train.callbacks import CallbackList, EarlyStopOnNaN

    cb = EarlyStopOnNaN()
    assert cb.should_stop(1, {"loss": float("nan")}) is True
    cb2 = EarlyStopOnNaN()
    assert cb2.should_stop(1, {"loss": 0.5}) is False
    # CallbackList ORs its members
    class Never:
        def should_stop(self, step, metrics):
            return False

    class NowAt3:
        def should_stop(self, step, metrics):
            return step >= 3

    cl = CallbackList([Never(), NowAt3()])
    assert cl.should_stop(2, {}) is False
    assert cl.should_stop(3, {}) is True


def test_early_stop_on_nan_halts_training(tmp_path, monkeypatch):
    """A NaN loss mid-run stops at the next log boundary instead of
    burning the remaining budget (the reference has no such guard)."""
    from latte_tpu.train.callbacks import EarlyStopOnNaN

    nan_after = {"n": 0}

    class NaNInjector(EarlyStopOnNaN):
        def should_stop(self, step, metrics):
            # simulate a divergence detected at step >= 2
            m = dict(metrics)
            if step >= 2:
                m["loss"] = float("nan")
            return super().should_stop(step, m)

    cfg = _tiny_cfg(tmp_path)
    out = Trainer(max_steps=10, log_every=1, callbacks=[NaNInjector()]).fit(cfg)
    assert out["final_step"] == 2
