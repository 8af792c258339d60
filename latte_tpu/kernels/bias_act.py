"""Fused bias + activation (+gain +clamp) — XLA implementation.

Capability parity with the reference plugin wrapper
(`/root/reference/tools/torch_utils/ops/bias_act.py`): nine named
activations with per-activation default gains, optional bias axis, output
gain and symmetric clamp. On TPU, XLA fuses this chain into neighboring
ops, so the "kernel" is simply a jnp expression; gradients (including
second order) come free from JAX's composable autodiff — the reference
needed a hand-written CUDA fwd/bwd pair for that. The native CPU library
(:mod:`latte_tpu.native`) implements the same spec for host-side use.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ActSpec:
    fn: Callable[[jnp.ndarray, float], jnp.ndarray]
    def_alpha: float = 0.0
    def_gain: float = 1.0


activation_funcs: Dict[str, ActSpec] = {
    "linear": ActSpec(lambda x, a: x),
    "relu": ActSpec(lambda x, a: jax.nn.relu(x), def_gain=math.sqrt(2)),
    "lrelu": ActSpec(
        lambda x, a: jax.nn.leaky_relu(x, a), def_alpha=0.2, def_gain=math.sqrt(2)
    ),
    "tanh": ActSpec(lambda x, a: jnp.tanh(x)),
    "sigmoid": ActSpec(lambda x, a: jax.nn.sigmoid(x)),
    "elu": ActSpec(lambda x, a: jax.nn.elu(x, 1.0)),
    "selu": ActSpec(lambda x, a: jax.nn.selu(x)),
    "softplus": ActSpec(lambda x, a: jax.nn.softplus(x)),
    "swish": ActSpec(lambda x, a: jax.nn.silu(x), def_gain=math.sqrt(2)),
}


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jnp.ndarray:
    """y = clamp(gain * act(x + broadcast(b, axis=dim)))."""
    spec = activation_funcs[act]
    alpha = spec.def_alpha if alpha is None else float(alpha)
    gain = spec.def_gain if gain is None else float(gain)
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
