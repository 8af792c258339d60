"""Microbench: int8 vs bf16 attention core at the XL/2 serving shapes.

Times the (QK^T -> softmax -> AV) chain only — 14 back-to-back calls
inside one lax.scan within one jit (eager relay dispatch costs ~1 ms/call,
docs/tpu_notes.md), at both layouts the serving step runs:

- spatial: batch B*F=32, N=256, H=16, hd=72
- temporal: batch B*T=512, N=16, H=16, hd=72

Variants:
- bf16:      the shipped XLA path (bf16 dots, fp32 softmax)
- int8 qk:   q/k quantized per head (dynamic per-head amax), logits dot
             int8*int8->int32 at the MXU's 2x rate; softmax + AV in bf16
- int8 full: additionally quantizes the softmax probs per ROW (near-
             uniform rows have rowmax ~1/N, so a fixed [0,1] scale would
             zero them out — measured rel err 0.34 at N=256) and V per
             head, running AV int8 too

Run on the TPU relay: python scripts/bench_int8_attention.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp

H, HD = 16, 72
REPS = 14  # block pairs per step
TIMED = 20


def bf16_chain(q, k, v):
    scale = HD**-0.5
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def _q8_per_head(a):
    amax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=(0, 1, 3), keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    a_i8 = jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return a_i8, s  # s: (1, 1, H, 1)


def _int8_logits(q, k):
    scale = HD**-0.5
    q_i8, sq = _q8_per_head(q)
    k_i8, sk = _q8_per_head(k)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q_i8, k_i8, preferred_element_type=jnp.int32
    )
    ls = (sq * sk).reshape(1, H, 1, 1) * scale
    return logits.astype(jnp.float32) * ls


def int8_qk_chain(q, k, v):
    probs = jax.nn.softmax(_int8_logits(q, k), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def int8_full_chain(q, k, v):
    probs = jax.nn.softmax(_int8_logits(q, k), axis=-1)
    # per-row prob scale: rowmax/127 keeps near-uniform rows (rowmax ~1/N)
    # on the full int8 range
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    ps = jnp.maximum(pmax, 1e-8) / 127.0
    p_i8 = jnp.round(probs / ps).astype(jnp.int8)
    v_i8, sv = _q8_per_head(v)
    out = jnp.einsum("bhnm,bmhd->bnhd", p_i8, v_i8, preferred_element_type=jnp.int32)
    # ps is (b, H, n, 1) on the bhnm layout -> (b, n, H, 1) on bnhd
    return (out.astype(jnp.float32) * ps.transpose(0, 2, 1, 3) * sv).astype(q.dtype)


def timed(fn, q, k, v, label):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            # the output becomes the next q: a real data dependency, so
            # the scan body cannot be dead-code-eliminated
            return fn(qc, k, v), None

        qq, _ = jax.lax.scan(body, q, None, length=REPS)
        return qq

    run(q, k, v).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(TIMED):
        run(q, k, v).block_until_ready()
    dt = (time.perf_counter() - t0) / TIMED / REPS * 1e6
    print(f"  {label}: {dt:8.1f} us/call")
    return dt


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    for tag, b, n in (("spatial", 32, 256), ("temporal", 512, 16)):
        print(f"{tag}: batch={b} N={n} H={H} hd={HD}")
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (
            jax.random.normal(kk, (b, n, H, HD), jnp.bfloat16) for kk in ks
        )
        t_bf = timed(bf16_chain, q, k, v, "bf16     ")
        t_qk = timed(int8_qk_chain, q, k, v, "int8 qk  ")
        t_i8 = timed(int8_full_chain, q, k, v, "int8 full")
        print(f"  speedup qk: {t_bf / t_qk:.2f}x  full: {t_bf / t_i8:.2f}x")
        ref = bf16_chain(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        for name, fn in (("qk  ", int8_qk_chain), ("full", int8_full_chain)):
            got = fn(q, k, v).astype(jnp.float32)
            cos = float(
                jnp.vdot(ref, got) / (jnp.linalg.norm(ref) * jnp.linalg.norm(got))
            )
            rel = float(jnp.linalg.norm(ref - got) / jnp.linalg.norm(ref))
            print(f"  {name} cos vs fp32: {cos:.6f}  rel err: {rel:.4f}")


if __name__ == "__main__":
    main()
