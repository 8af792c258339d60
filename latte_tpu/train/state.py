"""Train state: params + EMA + optimizer state, and the reference's
optimization defaults (AdamW lr 1e-4 wd 0, EMA 0.9999, warmup-then-constant
LR — `/root/reference/train.py:128,155-160`, `utils.py:190-200`)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    ema_params: Any
    opt_state: Any


def make_lr_schedule(
    lr: float = 1e-4,
    warmup_steps: int = 0,
    schedule: str = "warmup",
    decay_steps: int = 0,
    lr_min: float = 0.0,
) -> optax.Schedule:
    """The reference's two LR schedules (`/root/reference/models/__init__.py:12-28`):

    - ``"warmup"`` — linear warmup to ``lr`` then constant (the default the
      train scripts actually use, `train.py:155-160`).
    - ``"cosine"`` — torch ``CosineAnnealingLR`` semantics over
      ``decay_steps`` (T_max): ``lr_min + (lr-lr_min)*(1+cos(pi*t/T_max))/2``,
      composed after the same linear warmup.
    """
    if schedule == "cosine":
        if decay_steps <= 0:
            raise ValueError("cosine schedule requires decay_steps (T_max) > 0")
        cosine = optax.cosine_decay_schedule(
            lr, decay_steps, alpha=lr_min / lr if lr else 0.0
        )
        if warmup_steps <= 0:
            return cosine
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), cosine],
            boundaries=[warmup_steps],
        )
    if schedule != "warmup":
        raise NotImplementedError(f"lr schedule {schedule!r}")
    if warmup_steps <= 0:
        return optax.constant_schedule(lr)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps), optax.constant_schedule(lr)],
        boundaries=[warmup_steps],
    )


def trainable_temporal_attn_mask(params):
    """fixed_spatial fine-tuning trainability mask: True only for the
    temporal attention leaves (reference `train_with_img.py:124-134`)."""
    import jax

    def rule(path, _):
        keys = jax.tree_util.keystr(path)
        return ("temporal" in keys) and ("attn" in keys)

    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    decay_mask=None,
    schedule: str = "warmup",
    decay_steps: int = 0,
    lr_min: float = 0.0,
    mu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW; ``decay_mask`` (pytree/callable of bools) restricts weight
    decay to trainable leaves — frozen (zero-grad) params must not decay
    (the reference's requires_grad=False exempts them implicitly).

    ``mu_dtype`` (e.g. ``jnp.bfloat16``) stores the FIRST moment at reduced
    precision — the single-chip training step is bound by optimizer-state
    HBM traffic (docs/tpu_notes.md "training roofline"), and mu's per-step
    increment is (1-b1)=10% of the gradient, comfortably above bf16's
    ~0.4% resolution. The second moment must stay fp32: its increment is
    (1-b2)=0.1% of magnitude, BELOW bf16 resolution — a bf16 nu would stop
    accumulating entirely (the same argument keeps the 0.9999-decay EMA
    fp32)."""
    return optax.adamw(
        make_lr_schedule(
            lr, warmup_steps, schedule=schedule, decay_steps=decay_steps, lr_min=lr_min
        ),
        weight_decay=weight_decay,
        mask=decay_mask,
        mu_dtype=mu_dtype,
    )


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    """EMA starts as a copy of params (reference: `update_ema(..., decay=0)`
    at init, `train.py:163`)."""
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )


def update_ema(ema_params, params, decay: float = 0.9999):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )
