"""Block-cache operating points: videos/min + fidelity per (k, interval).

Sweeps cache_pairs x cache_interval on the XL/2 DDIM-50 protocol (B=1,
16f 256² latents): static-int8 timing (zero weights — value-independent)
and final-latent fidelity vs the exact bf16 chain (shared random weights).
Produces the table users pick a serving operating point from
(docs/tpu_notes.md)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.core.block_cache import cached_sample_loop
from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_model

POINTS = [(7, 2), (9, 2), (11, 2), (9, 3), (11, 3)]
RUNS = 3


def init_params(model, x_shape, kind):
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros(x_shape, jnp.float32),
            jnp.zeros((1,), jnp.int32),
        )
    )
    if kind == "zeros":
        def mk(s):
            if s.dtype == jnp.int8:
                return jnp.zeros(s.shape, jnp.int8)
            if s.dtype == jnp.float32:
                return jnp.full(s.shape, 0.01, jnp.float32)
            return jnp.zeros(s.shape, jnp.bfloat16)

        return jax.jit(lambda: jax.tree_util.tree_map(mk, shapes))()
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def mk_rand():
        ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
             for k, s in zip(ks, leaves)],
        )

    return mk_rand()


def main():
    print("backend:", jax.default_backend())
    diffusion = create_diffusion("ddim50")
    x_shape = (1, 16, 4, 32, 32)
    common = dict(
        input_size=32, num_frames=16, extras=1, learn_sigma=True,
        attention_mode="auto", unroll_blocks=False, dtype=jnp.bfloat16,
    )
    fmodel = get_model("Latte-XL/2", **common)
    qmodel = get_model("Latte-XL/2", quantized="static", **common)
    qp = init_params(qmodel, x_shape, "zeros")
    rp = init_params(fmodel, x_shape, "rand")
    z0 = jax.random.normal(jax.random.PRNGKey(11), x_shape, jnp.float32)

    # exact bf16 chain on random weights: the fidelity baseline
    @jax.jit
    def exact_bf16(p, z):
        return cached_sample_loop(
            diffusion, fmodel, p, z, cache_pairs=1, cache_interval=1
        )

    lat_exact = np.asarray(exact_bf16(rp, z0), np.float64)

    print(f"{'k':>3} {'interval':>8} {'int8 videos/min':>16} {'cos':>8} {'rel_err':>8}")
    for k, interval in POINTS:
        @jax.jit
        def timed(p, z, k=k, n=interval):
            return cached_sample_loop(
                diffusion, qmodel, p, z, cache_pairs=k, cache_interval=n
            )

        z = timed(qp, z0)
        np.asarray(z[0, 0, 0, 0, 0])  # compile+run
        t0 = time.perf_counter()
        for _ in range(RUNS):
            z = timed(qp, z)
        np.asarray(z[0, 0, 0, 0, 0])
        vpm = RUNS * 60.0 / (time.perf_counter() - t0)

        @jax.jit
        def fid(p, z, k=k, n=interval):
            return cached_sample_loop(
                diffusion, fmodel, p, z, cache_pairs=k, cache_interval=n
            )

        lat = np.asarray(fid(rp, z0), np.float64)
        cos = float(
            (lat * lat_exact).sum()
            / (np.linalg.norm(lat) * np.linalg.norm(lat_exact) + 1e-12)
        )
        rel = float(
            np.linalg.norm(lat - lat_exact) / (np.linalg.norm(lat_exact) + 1e-12)
        )
        print(f"{k:>3} {interval:>8} {vpm:>16.1f} {cos:>8.4f} {rel:>8.4f}")


if __name__ == "__main__":
    main()
