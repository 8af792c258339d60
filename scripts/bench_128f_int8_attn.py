"""Interleaved A/B: does the int8 attention core win at 128 frames?

Round-5 follow-up to the 16f measurement (docs/tpu_notes.md "int8
attention"): at the fvd2048_128f protocol shape
(`/root/reference/tools/metrics/metric_main.py:121-132`) BOTH attention
layouts — spatial (B·F=128, N=256) and temporal (B·T=256, N=128) — sit
below flash_min_n=512, so they run through the XLA core where the int8
QKᵀ/P·V dots apply, and attention is ~16% of the 128f DDIM step (round-4
trace). This script measures static-W8A8 vs static-W8A8+int8_attention as
one on-device DDIM-50 scan per trajectory, interleaved A/B/A to cancel
relay drift.

Usage: python scripts/bench_128f_int8_attn.py [rounds]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.models import get_model

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = jax.random.PRNGKey(0)
    x_shape = (1, 128, 4, 32, 32)
    t0c = jnp.zeros((1,), jnp.int32)
    diffusion = create_diffusion("ddim50")

    def build(int8_attention: bool):
        m = get_model(
            "Latte-XL/2",
            input_size=32,
            num_frames=128,
            extras=1,
            learn_sigma=True,
            attention_mode="auto",
            unroll_blocks=False,
            dtype=jnp.bfloat16,
            quantized="static",
            int8_attention=int8_attention,
        )
        shapes = jax.eval_shape(
            lambda: m.init({"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c)
        )

        @jax.jit
        def init():
            def mk(s):
                if s.dtype == jnp.int8:
                    return jnp.zeros(s.shape, jnp.int8)
                if s.dtype == jnp.float32:
                    return jnp.full(s.shape, 0.01, jnp.float32)
                return jnp.zeros(s.shape, jnp.bfloat16)

            return jax.tree_util.tree_map(mk, shapes)

        ts_arr = jnp.arange(diffusion.num_timesteps - 1, -1, -1, jnp.int32)

        @jax.jit
        def scan(p, z):
            def body(zc, t_scalar):
                t = jnp.full((zc.shape[0],), t_scalar, jnp.int32)
                out = diffusion.ddim_sample(
                    lambda xx, tt: m.apply(p, xx, tt), zc, t, jnp.zeros_like(zc)
                )["sample"]
                return out, None

            zf, _ = jax.lax.scan(body, z, ts_arr)
            return zf

        return init(), scan

    variants = {
        "int8": build(False),
        "int8+attn": build(True),
    }
    z0 = jax.random.normal(jax.random.PRNGKey(21), x_shape, jnp.float32)
    # compile both before timing anything
    for name, (p, scan) in variants.items():
        t0 = time.perf_counter()
        np.asarray(scan(p, z0)[0, 0, 0, 0, 0])
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(rounds):
        for name, (p, scan) in variants.items():
            t0 = time.perf_counter()
            v = np.asarray(scan(p, z0)[0, 0, 0, 0, 0])
            dt = time.perf_counter() - t0
            assert np.isfinite(v)
            times[name].append(dt)
            print(f"round {r} {name}: {dt:.3f}s/traj", flush=True)

    for name, ts in times.items():
        med = statistics.median(ts)
        print(
            f"{name}: median {med:.3f}s/traj = {60.0 / med:.3f} videos/min "
            f"({med * 1000 / 50:.2f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
