"""Orbax checkpointing with the reference's load semantics.

Saves ``{params, ema_params, opt_state, step}`` (the reference omits
optimizer state — `/root/reference/train.py:260-271` — we fix that);
`find_model` prefers EMA weights like the reference loader
(`utils.py:274-287`) and transparently converts reference `.pt` files via
:mod:`latte_tpu.tools.convert`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from latte_tpu.train.state import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_ASYNC = None


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        import orbax.checkpoint as ocp

        _ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC


def save_checkpoint(path: str, state: TrainState, *, block: bool = True) -> str:
    """Save full train state to ``path`` (an orbax directory).

    ``block=False`` uses orbax's async checkpointer: device arrays are
    snapshotted to host before the call returns (so the caller may donate
    or mutate them immediately), while serialization + disk write proceed
    in a background thread. Call :func:`wait_for_saves` before reading the
    checkpoint back or exiting the process. The reference blocks training
    for the entire torch.save (`/root/reference/train.py:260-271`).
    """
    path = os.path.abspath(path)
    payload = {
        "step": np.asarray(state.step),
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
    }
    if block:
        if jax.process_count() == 1:
            # single-process: host numpy trees serialize fastest
            payload = jax.device_get(payload)
        # multi-process: pass device arrays straight through — orbax's
        # PyTreeCheckpointer performs the cross-host collective write for
        # sharded arrays; device_get would raise on non-addressable shards
        _checkpointer().save(path, payload, force=True)
    else:
        _async_checkpointer().save(path, payload, force=True)
    return path


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint write has committed."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    return _checkpointer().restore(os.path.abspath(path), item=target)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Find the newest step-numbered checkpoint dir (e.g. ``0050000``)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps, key=int))


def latest_checkpoint_under(
    results_dir: str, model: Optional[str] = None
) -> Optional[str]:
    """Scan every ``<results_dir>/*/checkpoints`` for the highest-step
    checkpoint — used when ``resume_from_checkpoint: true`` is set without
    a path (each run gets a fresh auto-indexed experiment dir, so the
    current run's own checkpoints dir is always empty at startup).

    When ``model`` is given, experiments whose saved ``config.yaml`` names
    a DIFFERENT model are skipped — otherwise a higher-step checkpoint of
    another architecture in the same results dir would win and fail (or
    silently resume the wrong weights)."""
    if not os.path.isdir(results_dir):
        return None

    def exp_model(exp: str) -> Optional[str]:
        cfg = os.path.join(results_dir, exp, "config.yaml")
        try:
            import yaml

            with open(cfg) as f:
                m = yaml.safe_load(f).get("model")
            # a config without a 'model' key must not exclude the
            # candidate (str(None) == 'None' would never match)
            return None if m is None else str(m)
        except Exception:
            return None  # unreadable config: don't exclude

    best, best_step = None, -1
    for exp in sorted(os.listdir(results_dir)):
        if model is not None:
            m = exp_model(exp)
            if m is not None and m != str(model):
                continue
        cand = latest_checkpoint(os.path.join(results_dir, exp, "checkpoints"))
        if cand is not None:
            step = int(os.path.basename(cand))
            if step > best_step:
                best, best_step = cand, step
    return best


def find_model(
    path: str,
    depth: Optional[int] = None,
    num_heads: int = 16,
    prefer_ema: bool = True,
):
    """Load inference params from either an orbax dir or a reference `.pt`.

    Returns a Flax params tree; prefers EMA weights when present.
    """
    if os.path.isdir(path):
        payload = load_checkpoint(path)
        key = "ema_params" if prefer_ema and "ema_params" in payload else "params"
        return payload[key]
    # torch .pt from the reference release
    from latte_tpu.tools.convert import convert_latte_state_dict, load_torch_checkpoint

    assert depth is not None, "depth required to convert a reference .pt checkpoint"
    sd = load_torch_checkpoint(path, prefer_ema=prefer_ema)
    return convert_latte_state_dict(sd, depth=depth, num_heads=num_heads)
