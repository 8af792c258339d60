"""Batch sweep of the XL/2 DDIM step: videos/min/chip vs batch size.

Weight streaming (~2.8 ms/step at bf16, half that at int8) amortizes over
the batch, so serving THROUGHPUT (videos/min/chip) can prefer B>1 even when
B=1 wins latency. Round-3 only measured bf16 B∈{1,2}; this sweeps both
precisions and fused_adaln.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_model

ITERS = 20


def main():
    print("backend:", jax.default_backend())
    diffusion = create_diffusion("ddim50")
    rng = jax.random.PRNGKey(0)

    # fused_adaln is measured as a wash on bf16 and a loss under int8
    # (scripts/bench_adaln_e2e.py, docs/tpu_notes.md) — sweep it off.
    for quant in (False, True, "static"):
        for fused in (False,):
            model = get_model(
                "Latte-XL/2",
                input_size=32,
                num_frames=16,
                extras=1,
                learn_sigma=True,
                attention_mode="auto",
                unroll_blocks=True,
                fused_adaln=fused,
                quantized=quant,
                dtype=jnp.bfloat16,
            )
            for B in (1, 2, 4, 8):
                x_shape = (B, 16, 4, 32, 32)
                t0c = jnp.zeros((B,), jnp.int32)
                shapes = jax.eval_shape(
                    lambda m=model, xs=x_shape, tc=t0c: m.init(
                        {"params": rng}, jnp.zeros(xs, jnp.float32), tc
                    )
                )

                @jax.jit
                def init_p(shapes=shapes):
                    def mk(s):
                        if s.dtype == jnp.int8:
                            return jnp.zeros(s.shape, jnp.int8)
                        if s.dtype == jnp.float32:
                            return jnp.full(s.shape, 0.01, jnp.float32)
                        return jnp.zeros(s.shape, jnp.bfloat16)

                    return jax.tree_util.tree_map(mk, shapes)

                p = init_p()

                @jax.jit
                def ddim_step(pp, x, t_scalar, m=model):
                    t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
                    return diffusion.ddim_sample(
                        lambda xx, tt: m.apply(pp, xx, tt), x, t, jnp.zeros_like(x)
                    )["sample"]

                try:
                    z = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
                    tsc = jnp.int32(49)
                    z = ddim_step(p, z, tsc)
                    np.asarray(z[0, 0, 0, 0, 0])
                    t0 = time.perf_counter()
                    for _ in range(ITERS):
                        z = ddim_step(p, z, tsc)
                    np.asarray(z[0, 0, 0, 0, 0])
                    ms = (time.perf_counter() - t0) / ITERS * 1e3
                    vpm = B * 60e3 / (ms * 50)
                    print(
                        f"int8={quant} fused={int(fused)} B={B}: "
                        f"{ms:7.2f} ms/step  {vpm:6.2f} videos/min/chip"
                    )
                    sys.stdout.flush()
                except Exception as e:
                    print(f"int8={quant} fused={int(fused)} B={B}: FAILED {e!r:.100}")


if __name__ == "__main__":
    main()
