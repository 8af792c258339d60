"""Microbench: fused adaLN glue (Pallas) vs the XLA-compiled chain.

Shapes mirror the XL/2 256² DDIM step with CFG (B=2): spatial blocks see
(B·F=32, 256, 1152), temporal blocks (B·T=512, 16, 1152). The XLA
baseline is exactly the math AdaLNBlock compiles today; the candidate is
latte_tpu.kernels.adaln. Also checks numerical agreement.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.kernels.adaln import (
    ln_modulate,
    ln_modulate_reference,
    residual_ln_modulate,
    residual_ln_modulate_reference,
)


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench(B, N, D, dtype):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, N, D), dtype)
    delta = jax.random.normal(ks[1], (B, N, D), dtype)
    gate = jax.random.normal(ks[2], (B, D), dtype)
    shift = jax.random.normal(ks[3], (B, D), dtype)
    scale = jax.random.normal(ks[4], (B, D), dtype)

    f_ref = jax.jit(ln_modulate_reference)
    f_ker = jax.jit(ln_modulate)
    g_ref = jax.jit(residual_ln_modulate_reference)
    g_ker = jax.jit(residual_ln_modulate)

    # agreement
    a, b = f_ref(x, shift, scale), f_ker(x, shift, scale)
    err1 = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    (ya, oa), (yb, ob) = g_ref(x, delta, gate, shift, scale), g_ker(
        x, delta, gate, shift, scale
    )
    err2 = max(
        float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))),
        float(jnp.max(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32)))),
    )

    t_ref = timeit(f_ref, x, shift, scale)
    t_ker = timeit(f_ker, x, shift, scale)
    t_gref = timeit(g_ref, x, delta, gate, shift, scale)
    t_gker = timeit(g_ker, x, delta, gate, shift, scale)
    bytes_ln = (2 * B * N * D + 2 * B * D) * x.dtype.itemsize
    bytes_res = (4 * B * N * D + 3 * B * D) * x.dtype.itemsize
    print(
        f"({B},{N},{D}) {x.dtype.name}: ln_mod xla {t_ref:.3f} ms  pallas {t_ker:.3f} ms "
        f"(hbm-bound {bytes_ln/819e9*1e3:.3f} ms)  err {err1:.2e}"
    )
    print(
        f"({B},{N},{D}) {x.dtype.name}: res_ln xla {t_gref:.3f} ms  pallas {t_gker:.3f} ms "
        f"(hbm-bound {bytes_res/819e9*1e3:.3f} ms)  err {err2:.2e}"
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for dtype in (jnp.bfloat16,):
        bench(32, 256, 1152, dtype)   # spatial layout
        bench(512, 16, 1152, dtype)   # temporal layout
