"""Compare bf16 vs W8A8-int8 Latte-XL/2 forward time on the real chip."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

BATCH = 1
ITERS = 20


def timed(fn, params, x, t):
    out = fn(params, x, t)
    np.asarray(out[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    z = x
    for _ in range(ITERS):
        z = fn(params, z[:, :, :4] if z.shape[2] > 4 else z, t)
    np.asarray(z[0, 0, 0, 0, 0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from latte_tpu.models import get_model

    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 16, 4, 32, 32), jnp.float32)
    t = jnp.zeros((BATCH,), jnp.int32)

    for quantized in (False, True):
        model = get_model(
            "Latte-XL/2",
            input_size=32,
            num_frames=16,
            extras=1,
            learn_sigma=True,
            attention_mode="auto",
            unroll_blocks=True,
            quantized=quantized,
            dtype=jnp.bfloat16,
        )
        shapes = jax.eval_shape(
            lambda m=model: m.init({"params": jax.random.PRNGKey(0)}, x, t)
        )

        @jax.jit
        def zeros_like_shapes(shapes=shapes):
            def mk(s):
                if s.dtype == jnp.int8:
                    return jnp.zeros(s.shape, jnp.int8)
                if s.dtype == jnp.float32:
                    return jnp.ones(s.shape, jnp.float32) * 0.01
                return jnp.zeros(s.shape, jnp.bfloat16)

            return jax.tree_util.tree_map(mk, shapes)

        params = zeros_like_shapes()

        @jax.jit
        def fwd(p, xx, tt):
            return model.apply(p, xx, tt)

        ms = timed(fwd, params, x, t)
        print(f"{'int8' if quantized else 'bf16'}: {ms:.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
