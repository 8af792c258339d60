"""Interleaved A/B/A of the XL/2 DDIM step: bf16 vs dynamic-int8 vs
static-int8 at B=1.

Relay throughput drifts ±10% run-to-run, so one-shot orderings mislead
(round-4 saw static measured both 21.7 ms and 34.8 ms in different
sessions). All three compiled steps are held and timed in interleaved
rounds; per-variant medians-of-rounds cancel the drift.
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

BATCH = 1
ITERS = 20
ROUNDS = 5


def build(quantized, int8_attention=False):
    return get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=16,
        extras=1,
        learn_sigma=True,
        attention_mode="auto",
        unroll_blocks=True,
        quantized=quantized,
        int8_attention=int8_attention,
        dtype=jnp.bfloat16,
    )


def init_for(model, x_shape, t0c):
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros(x_shape, jnp.float32), t0c
        )
    )

    @jax.jit
    def mk():
        def f(s):
            if s.dtype == jnp.int8:
                return jnp.zeros(s.shape, jnp.int8)
            if s.dtype == jnp.float32:
                return jnp.full(s.shape, 0.01, jnp.float32)
            return jnp.zeros(s.shape, jnp.bfloat16)

        return jax.tree_util.tree_map(f, shapes)

    return mk()


def main():
    print("backend:", jax.default_backend())
    diffusion = create_diffusion("ddim50")
    x_shape = (BATCH, 16, 4, 32, 32)
    t0c = jnp.zeros((BATCH,), jnp.int32)
    z0 = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
    tsc = jnp.int32(49)

    variants = {}
    for name, quant, ia in (
        ("bf16", False, False),
        ("int8_dyn", True, False),
        ("int8_static", "static", False),
        # int8 attention core on top of static W8A8: at 256² both layouts
        # (spatial N=256, temporal N=16) resolve to the xla path, so the
        # QKᵀ/P·V int8 core applies everywhere ("full") or QKᵀ-only ("qk")
        ("int8_attn_qk", "static", "qk"),
        ("int8_attn_full", "static", True),
    ):
        model = build(quant, ia)
        p = init_for(model, x_shape, t0c)

        @jax.jit
        def step(pp, x, t_scalar, m=model):
            t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
            return diffusion.ddim_sample(
                lambda xx, tt: m.apply(pp, xx, tt), x, t, jnp.zeros_like(x)
            )["sample"]

        z = step(p, z0, tsc)
        np.asarray(z[0, 0, 0, 0, 0])  # compile
        variants[name] = (step, p)
        print(f"compiled {name}")

    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, (step, p) in variants.items():
            z = step(p, z0, tsc)
            np.asarray(z[0, 0, 0, 0, 0])  # sync before timing
            t0 = time.perf_counter()
            for _ in range(ITERS):
                z = step(p, z, tsc)
            np.asarray(z[0, 0, 0, 0, 0])
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            times[name].append(ms)
            print(f"round {r} {name:12s} {ms:7.2f} ms/step")

    print()
    for name, ts in times.items():
        med = float(np.median(ts))
        print(
            f"{name:12s} median {med:7.2f} ms/step  "
            f"({BATCH * 60e3 / (med * 50):.2f} videos/min @50 steps)  "
            f"all={[round(t, 1) for t in ts]}"
        )


if __name__ == "__main__":
    main()
