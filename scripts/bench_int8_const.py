"""Prepacked-weight (constant-baked) static-int8 serving experiment.

docs/tpu_notes.md "MFU roofline": with weights as jit ARGUMENTS XLA cannot
hoist per-consumer weight relayouts out of the step — the static-int8 trace
shows ~410 async copies/step re-staging sliced block weights. With weights
as HLO CONSTANTS the compiler pre-packs layouts once at compile time (the
standard serving trick). At bf16 the 1.35 GB constant blob never finished
compiling through the relay (round 3, 2x 10-min timeouts); int8 weights are
half the bytes — this script retries at int8 and measures the win.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_model

ITERS = 20
ROUNDS = 3


def main():
    print("backend:", jax.default_backend())
    diffusion = create_diffusion("ddim50")
    x_shape = (1, 16, 4, 32, 32)
    t0c = jnp.zeros((1,), jnp.int32)
    model = get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=16,
        extras=1,
        learn_sigma=True,
        attention_mode="auto",
        unroll_blocks=True,
        quantized="static",
        dtype=jnp.bfloat16,
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros(x_shape, jnp.float32), t0c
        )
    )

    # host-side numpy params -> baked into the HLO as constants
    def mk(s):
        if s.dtype == jnp.int8:
            return np.zeros(s.shape, np.int8)
        if s.dtype == jnp.float32:
            return np.full(s.shape, 0.01, np.float32)
        return np.zeros(s.shape, np.float16).astype(jnp.bfloat16)

    params_np = jax.tree_util.tree_map(mk, shapes)
    nbytes = sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(params_np)
    )
    print(f"constant params: {nbytes/1e9:.2f} GB")

    @jax.jit
    def ddim_step_const(x, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
        return diffusion.ddim_sample(
            lambda xx, tt: model.apply(params_np, xx, tt), x, t, jnp.zeros_like(x)
        )["sample"]

    z0 = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
    tsc = jnp.int32(49)
    t0 = time.perf_counter()
    z = ddim_step_const(z0, tsc)
    np.asarray(z[0, 0, 0, 0, 0])
    print(f"compiled+ran in {time.perf_counter()-t0:.1f}s")

    for r in range(ROUNDS):
        z = ddim_step_const(z0, tsc)
        np.asarray(z[0, 0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            z = ddim_step_const(z, tsc)
        np.asarray(z[0, 0, 0, 0, 0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"round {r} const-int8-static {ms:7.2f} ms/step "
              f"({60e3/(ms*50):.2f} videos/min @50 steps)")


if __name__ == "__main__":
    main()
