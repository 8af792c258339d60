"""Measure the int4-weights lever: does s4 weight storage beat s8?

docs/tpu_notes.md (round-4 int8 conclusion) names "int4 weights" as one of
the two remaining arithmetic changes. On v5e the MXU has no native int4
mode through XLA — an s4 operand is converted to s8 at the dot's operand
read — so the only possible win is weight HBM traffic (halved again vs
int8). Round 4 measured that weight streaming already fully overlaps
compute at the 16f B=1 serving shape (constant-baked int8 weights: zero
win), which predicts int4 is a wash there; this script tests that
prediction directly at the XL matmul shapes, and at a weight-traffic-
dominated shape (tiny token count) where int4 SHOULD win if the convert
is free, separating "s4 loads are slow" from "weights aren't the
bottleneck".

Three variants per shape, interleaved, scan-timed (50 iterations per
dispatch so relay latency cancels):
  w8:   x_i8 (tokens, D) @ w_i8 (D, 4D)  -> s32, fp32 rescale
  w4:   same but w stored s4, cast .astype(int8) inside the jit
  bf16: the exact-path reference point

Usage: python scripts/bench_int4_weights.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    D = 1152  # Latte-XL hidden
    SHAPES = [
        # (name, tokens) — 4096 = the 16f 256² spatial token count per
        # sample (16 frames × 256 tokens); 64 = weight-bound regime
        ("serving-16f", 4096),
        ("weight-bound", 64),
    ]
    ITERS = 50
    ROUNDS = 5
    rng = np.random.default_rng(0)

    for name, tokens in SHAPES:
        x = jnp.asarray(
            rng.integers(-127, 128, size=(tokens, D)), jnp.int8
        )
        w8 = jnp.asarray(rng.integers(-127, 128, size=(D, 4 * D)), jnp.int8)
        # int4 range is [-8, 7]; jnp.int4 packs two nibbles per byte in HBM
        w4 = jnp.asarray(rng.integers(-8, 8, size=(D, 4 * D)), jnp.int4)
        xb = x.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        scale = jnp.full((4 * D,), 0.01, jnp.float32)

        def timed(fn, *args):
            jitted = jax.jit(fn)
            np.asarray(jitted(*args))[0, 0]  # compile
            ts = []
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                np.asarray(jitted(*args))[0, 0]
                ts.append((time.perf_counter() - t0) / ITERS * 1e6)
            return statistics.median(ts)

        def dot_i8(x, w, scale):
            def body(acc, _):
                o = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return acc + (o.astype(jnp.float32) * scale).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(
                body, jnp.zeros((x.shape[0], w.shape[1]), jnp.bfloat16),
                None, length=ITERS,
            )
            return out

        def dot_i4(x, w, scale):
            def body(acc, _):
                o = jax.lax.dot_general(
                    x, w.astype(jnp.int8), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return acc + (o.astype(jnp.float32) * scale).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(
                body, jnp.zeros((x.shape[0], w.shape[1]), jnp.bfloat16),
                None, length=ITERS,
            )
            return out

        def dot_bf16(x, w):
            def body(acc, _):
                o = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc + o.astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(
                body, jnp.zeros((x.shape[0], w.shape[1]), jnp.bfloat16),
                None, length=ITERS,
            )
            return out

        try:
            t4 = timed(dot_i4, x, w4, scale)
        except Exception as e:  # relay/XLA may reject s4 entirely
            t4 = None
            print(f"{name}: s4 path failed: {e!r}"[:200], flush=True)
        t8 = timed(dot_i8, x, w8, scale)
        tb = timed(dot_bf16, xb, wb)
        msg = f"{name} ({tokens}x{D} @ {D}x{4 * D}): w8 {t8:.2f}us  bf16 {tb:.2f}us"
        if t4 is not None:
            msg += f"  w4 {t4:.2f}us ({t8 / t4:.2f}x vs w8)"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
