"""End-to-end A/B: the XL/2 DDIM step with fused_adaln on/off (real chip).

This is the measurement VERDICT r3 flagged as missing: kernels/adaln.py was
only ever benchmarked in isolation (scripts/bench_adaln.py). Here the whole
bench.py protocol step (Latte-XL/2, B=1, 16f, 32^2 latents, bf16, DDIM) runs
both ways, plus the int8-quantized model both ways, so the composition the
serving headline needs is measured too.
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
ITERS = 30


def build(fused: bool, quantized: bool, unroll: bool):
    return get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=16,
        extras=1,
        learn_sigma=True,
        attention_mode="auto",
        unroll_blocks=unroll,
        fused_adaln=fused,
        quantized=quantized,
        dtype=jnp.bfloat16,
    )


def main():
    print("backend:", jax.default_backend())
    diffusion = create_diffusion("ddim50")
    rng = jax.random.PRNGKey(0)
    x_shape = (BATCH, 16, 4, 32, 32)
    t0c = jnp.zeros((BATCH,), jnp.int32)

    base = build(False, False, True)
    shapes = jax.eval_shape(
        lambda: base.init({"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c)
    )

    @jax.jit
    def init_bf16():
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes
        )

    params = init_bf16()

    qmodel_probe = build(False, True, True)
    qshapes = jax.eval_shape(
        lambda: qmodel_probe.init({"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c)
    )

    @jax.jit
    def init_q():
        def mk(s):
            if s.dtype == jnp.int8:
                return jnp.zeros(s.shape, jnp.int8)
            if s.dtype == jnp.float32:
                return jnp.full(s.shape, 0.01, jnp.float32)
            return jnp.zeros(s.shape, jnp.bfloat16)

        return jax.tree_util.tree_map(mk, qshapes)

    qparams = init_q()

    z0 = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)

    def time_step(model, p, tag):
        @jax.jit
        def ddim_step(pp, x, t_scalar):
            t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
            return diffusion.ddim_sample(
                lambda xx, tt: model.apply(pp, xx, tt), x, t, jnp.zeros_like(x)
            )["sample"]

        tsc = jnp.int32(49)
        z = ddim_step(p, z0, tsc)
        np.asarray(z[0, 0, 0, 0, 0])  # compile+run
        t0 = time.perf_counter()
        for _ in range(ITERS):
            z = ddim_step(p, z, tsc)
        np.asarray(z[0, 0, 0, 0, 0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{tag:34s} {ms:7.2f} ms/step   ({60e3/(ms*50):.2f} videos/min @50 steps)")
        return ms

    smodel_probe = build(False, "static", True)
    sshapes = jax.eval_shape(
        lambda: smodel_probe.init({"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c)
    )

    @jax.jit
    def init_s():
        def mk(s):
            if s.dtype == jnp.int8:
                return jnp.zeros(s.shape, jnp.int8)
            if s.dtype == jnp.float32:
                return jnp.full(s.shape, 0.01, jnp.float32)
            return jnp.zeros(s.shape, jnp.bfloat16)

        return jax.tree_util.tree_map(mk, sshapes)

    sparams = init_s()

    results = {}
    for fused in (False, True):
        for quant in (False, True, "static"):
            tag = f"fused_adaln={fused} int8={quant}"
            model = build(fused, quant, True)
            p = {True: qparams, "static": sparams}.get(quant, params)
            try:
                results[tag] = time_step(model, p, tag)
            except Exception as e:
                print(f"{tag}: FAILED {e!r}")

    # numeric agreement of fused vs unfused on random weights (bf16 tolerance)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def init_rand():
        ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
             for k, s in zip(ks, leaves)],
        )

    rp = init_rand()
    m0 = build(False, False, True)
    m1 = build(True, False, True)
    o0 = np.asarray(jax.jit(m0.apply)(rp, z0, t0c), np.float32)
    o1 = np.asarray(jax.jit(m1.apply)(rp, z0, t0c), np.float32)
    rel = np.linalg.norm(o1 - o0) / (np.linalg.norm(o0) + 1e-12)
    print(f"fused vs unfused XL fwd rel err: {rel:.2e}  max abs {np.abs(o1-o0).max():.2e}")


if __name__ == "__main__":
    main()
