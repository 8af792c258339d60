"""High-level Trainer facade.

Capability parity with the reference's PyTorch-Lightning entry points
(`/root/reference/train_pl.py`, `train_with_img_pl.py`): a class-based
driver exposing fit / resume ergonomics and Lightning-style callback
hooks (:mod:`latte_tpu.train.callbacks`: on_train_start / on_log /
on_checkpoint / on_train_end / should_stop early stopping) over the same
fused jitted loop as :mod:`latte_tpu.train.train` — loops, logging,
checkpointing and device placement are native there, so one engine serves
both entry styles.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from latte_tpu.config import Config


class Trainer:
    """Usage::

        trainer = Trainer(max_steps=10_000, ckpt_every=1_000)
        result = trainer.fit(config)          # config: path or Config
    """

    def __init__(
        self,
        max_steps: Optional[int] = None,
        ckpt_every: Optional[int] = None,
        log_every: Optional[int] = None,
        results_dir: Optional[str] = None,
        callbacks=None,
    ):
        self.callbacks = list(callbacks or [])
        self._overrides: Dict = {}
        if max_steps is not None:
            self._overrides["max_train_steps"] = int(max_steps)
        if ckpt_every is not None:
            self._overrides["ckpt_every"] = int(ckpt_every)
        if log_every is not None:
            self._overrides["log_every"] = int(log_every)
        if results_dir is not None:
            self._overrides["results_dir"] = str(results_dir)

    def _resolve(self, config) -> Config:
        if isinstance(config, str):
            from latte_tpu.config import load_config

            config = load_config(config)
        cfg = Config(dict(config))
        cfg.update(self._overrides)
        return cfg

    def fit(self, config) -> Dict:
        from latte_tpu.train.train import main

        return main(self._resolve(config), callbacks=self.callbacks)

    def resume(self, config, checkpoint: str) -> Dict:
        cfg = self._resolve(config)
        cfg.resume_from_checkpoint = checkpoint
        from latte_tpu.train.train import main

        return main(cfg, callbacks=self.callbacks)
