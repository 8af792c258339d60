"""Tune flash-attention block configs on the real chip.

Chained value-dependent calls (out feeds next q) so the relay can't
overlap iterations; reports per-call ms for forward and for fwd+bwd.
Shapes are Latte-XL/2 spatial attention at 256² with CFG batch:
(B·F=32, N=1024, H=16, D=72).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from latte_tpu.kernels.attention import attention_reference, flash_attention  # noqa: E402

B, N, H, D = 32, 1024, 16, 72
ITERS = 10


def bench(fn, label):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, N, H, D), jnp.bfloat16)
    jfn = jax.jit(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32)))
    chain = jax.jit(fn)
    float(jfn(q, k, v))  # warm both compilations and force one execution
    jax.block_until_ready(chain(q, k, v))
    t0 = time.perf_counter()
    out = q
    for _ in range(ITERS):
        out = chain(out, k, v)  # chain: q depends on previous out
    float(jfn(out, k, v))  # host materialization bounds the whole chain
    dt = (time.perf_counter() - t0) / (ITERS + 1) * 1e3
    print(f"{label}: {dt:.3f}ms", flush=True)
    return dt


def bench_bwd(fn, label):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, N, H, D), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    gsum = jax.jit(
        lambda q, k, v: jnp.sum(jax.grad(loss)(q, k, v).astype(jnp.float32))
    )
    dq, dk, dv = g(q, k, v)
    float(gsum(q, k, v))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        dq, dk, dv = g(dq, k, v)  # chain through dq
    float(gsum(dq, k, v))  # host materialization bounds the whole chain
    dt = (time.perf_counter() - t0) / (ITERS + 1) * 1e3
    print(f"{label} fwd+bwd: {dt:.3f}ms", flush=True)
    return dt


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    if mode == "fwd":
        bench(attention_reference, "xla")
        for bq, bk, r in [(512, 1024, 1), (1024, 1024, 1), (256, 512, 1), (512, 256, 1)]:
            bench(
                lambda q, k, v, bq=bq, bk=bk, r=r: flash_attention(
                    q, k, v, block_q=bq, block_k=bk, rows=r
                ),
                f"bq{bq} bk{bk} r{r}",
            )
    else:
        bench_bwd(attention_reference, "xla")
        for bq, bk, r in [(1024, 1024, 1), (512, 1024, 1)]:
            bench_bwd(
                lambda q, k, v, bq=bq, bk=bk, r=r: flash_attention(
                    q, k, v, block_q=bq, block_k=bk, rows=r
                ),
                f"bq{bq} bk{bk} r{r}",
            )
