"""Weight pre-packing via compiler-chosen (AUTO) input layouts.

The round-3/4 roofline (docs/tpu_notes.md "MFU roofline") attributes
~2.8 ms of the 30 ms bf16 XL/2 serving step to weights being runtime
arguments in XLA's DEFAULT layout: the compiler either relays them out
per call or picks worse matmul schedules. The previously-tried fix —
baking weights as HLO constants — died on 1.35 GB programs.

This is the cheap alternative: jit the step with
``in_shardings=Format(Layout.AUTO)`` on the param tree so the compiler
PICKS the weight layouts it wants, query ``compiled.input_formats``, and
``jax.device_put`` the weights into those formats ONCE at load. Steady
state then runs with pre-packed weights and zero per-call relayout.

Interleaved A/B/A vs the default-layout step (same protocol as
scripts/bench_int8_ab.py). Run: python scripts/bench_weight_layout.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_model

BATCH = 1
ITERS = 20
ROUNDS = 5


def main():
    print("backend:", jax.default_backend())
    diffusion = create_diffusion("ddim50")
    x_shape = (BATCH, 16, 4, 32, 32)
    t0c = jnp.zeros((BATCH,), jnp.int32)
    model = get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=16,
        extras=1,
        learn_sigma=True,
        attention_mode="auto",
        unroll_blocks=True,
        dtype=jnp.bfloat16,
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros(x_shape, jnp.float32), t0c
        )
    )

    @jax.jit
    def mk():
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes
        )

    params = mk()

    def step_fn(p, x, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
        return diffusion.ddim_sample(
            lambda xx, tt: model.apply(p, xx, tt), x, t, jnp.zeros_like(x)
        )["sample"]

    z0 = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
    tsc = jnp.int32(49)

    # A: default layouts (the shipped step)
    step_default = jax.jit(step_fn)
    np.asarray(step_default(params, z0, tsc)[0, 0, 0, 0, 0])
    print("compiled default")

    # B: compiler-chosen weight layouts, weights pre-packed once
    auto_tree = jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), params)
    step_auto = jax.jit(step_fn, in_shardings=(auto_tree, None, None))
    compiled = step_auto.lower(params, z0, tsc).compile()
    in_fmts = compiled.input_formats[0][0]  # the param tree's formats
    # how many leaves did the compiler actually want in a NON-default
    # layout? (major_to_minor descending == default)
    n_nondefault = 0
    for fmt, leaf in zip(
        jax.tree_util.tree_leaves(in_fmts), jax.tree_util.tree_leaves(params)
    ):
        mtm = fmt.layout.major_to_minor
        if tuple(mtm) != tuple(range(leaf.ndim)):
            n_nondefault += 1
    total = len(jax.tree_util.tree_leaves(params))
    print(f"compiler-preferred non-default layouts: {n_nondefault}/{total} leaves")
    packed = jax.device_put(params, in_fmts)
    # AUTO is resolved at lower/compile time; calling with concrete arrays
    # requires a jit pinned to the CONCRETE formats the compiler chose
    step_packed = jax.jit(step_fn, in_shardings=(in_fmts, None, None))
    np.asarray(step_packed(packed, z0, tsc)[0, 0, 0, 0, 0])
    print("compiled auto-layout (weights pre-packed)")

    variants = {
        "default": (step_default, params),
        "auto_packed": (step_packed, packed),
    }
    times = {k: [] for k in variants}
    for r in range(ROUNDS):
        for name, (step, p) in variants.items():
            z = step(p, z0, tsc)
            np.asarray(z[0, 0, 0, 0, 0])
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
            f"{name:12s} median {med:7.2f} ms/step "
            f"({BATCH * 60e3 / (med * 50):.2f} videos/min @50)  "
            f"all={[round(t, 1) for t in ts]}"
        )


if __name__ == "__main__":
    main()
