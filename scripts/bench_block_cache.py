"""Block-cache operating points: videos/min + fidelity per (k, interval).

Sweeps cache_pairs x cache_interval on the XL/2 DDIM-50 protocol (B=1,
16f 256² latents): static-int8 timing (zero weights — value-independent)
and final-latent fidelity vs the exact bf16 chain (shared random weights).
Produces the table users pick a serving operating point from
(docs/tpu_notes.md).

``--ckpt PATH`` re-measures every fidelity number at TRAINED weights
(orbax dir or reference .pt, EMA preferred): cross-step feature
similarity — what block-cache exploits — is a trained-net property, so
the shipped (k, interval) default must come from this curve, not the
random-init one. The trained run additionally puts the full int8
calib->static recipe under each operating point (the real serving path)
and records the exact-int8 quality guard. ``--out FILE`` writes the
table as JSON (the runs/trained_validation artifact)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


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


def _cos_rel(lat, ref):
    cos = float(
        (lat * ref).sum() / (np.linalg.norm(lat) * np.linalg.norm(ref) + 1e-12)
    )
    rel = float(np.linalg.norm(lat - ref) / (np.linalg.norm(ref) + 1e-12))
    return cos, rel


def _quantize_trained(params_f32, common, x_shape):
    """The serving calib->static recipe (sample/sample.py) on real weights."""
    from latte_tpu.quant import merge_amax, quantize_params

    calib_m = get_model("Latte-XL/2", quantized="calib", **common)
    zc = jax.random.normal(jax.random.PRNGKey(0), x_shape, jnp.float32)

    @jax.jit
    def _amax(p, x, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
        _, variables = calib_m.apply(p, x, t, mutable=["calib"])
        return variables["calib"]

    amax = None
    for tc in (999, 500, 0):
        amax = merge_amax(amax, _amax({"params": params_f32}, zc, jnp.int32(tc)))
    return {"params": quantize_params(params_f32, act_amax=amax)}


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="trained checkpoint (orbax dir or reference .pt); "
                    "fidelity at real weights instead of random init")
    ap.add_argument("--out", default=None, help="write the table as JSON")
    ap.add_argument("--raw-params", action="store_true",
                    help="load the raw optimizer params instead of the EMA "
                    "(short runs where the 0.9999-decay EMA hasn't converged)")
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    diffusion = create_diffusion("ddim50")
    x_shape = (1, 16, 4, 32, 32)
    common = dict(
        input_size=32, num_frames=16, extras=1, learn_sigma=True,
        attention_mode="auto", unroll_blocks=False, dtype=jnp.bfloat16,
    )
    fmodel = get_model("Latte-XL/2", **common)
    qmodel = get_model("Latte-XL/2", quantized="static", **common)
    z0 = jax.random.normal(jax.random.PRNGKey(11), x_shape, jnp.float32)

    if args.ckpt:
        from latte_tpu.train.checkpoint import find_model

        params_f32 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32),
            find_model(args.ckpt, prefer_ema=not args.raw_params),
        )
        rp = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), params_f32
            )
        }
        qp = _quantize_trained(params_f32, common, x_shape)
        weights = "trained:" + args.ckpt
    else:
        qp = init_params(qmodel, x_shape, "zeros")
        rp = init_params(fmodel, x_shape, "rand")
        weights = "random-init"
    print("weights:", weights)

    # exact bf16 chain: the fidelity baseline
    @jax.jit
    def exact_bf16(p, z):
        return cached_sample_loop(
            diffusion, fmodel, p, z, cache_pairs=1, cache_interval=1
        )

    lat_exact = np.asarray(exact_bf16(rp, z0), np.float64)

    rows = []
    if args.ckpt:
        # exact-int8 quality guard at trained weights (bench.py's guard,
        # re-measured where it matters)
        @jax.jit
        def exact_int8(p, z):
            return cached_sample_loop(
                diffusion, qmodel, p, z, cache_pairs=1, cache_interval=1
            )

        cos, rel = _cos_rel(np.asarray(exact_int8(qp, z0), np.float64), lat_exact)
        print(f"int8 exact guard: cos={cos:.4f} rel={rel:.4f}")
        rows.append({"k": 1, "interval": 1, "int8_cos": round(cos, 4),
                     "int8_rel": round(rel, 4), "role": "int8-exact-guard"})

    hdr = f"{'k':>3} {'interval':>8} {'int8 videos/min':>16} {'cos':>8} {'rel_err':>8}"
    if args.ckpt:
        hdr += f" {'int8_cos':>9} {'int8_rel':>9}"
    print(hdr)
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

        cos, rel = _cos_rel(np.asarray(fid(rp, z0), np.float64), lat_exact)
        row = {"k": k, "interval": interval, "videos_per_min": round(vpm, 1),
               "cos": round(cos, 4), "rel": round(rel, 4)}
        line = f"{k:>3} {interval:>8} {vpm:>16.1f} {cos:>8.4f} {rel:>8.4f}"
        if args.ckpt:
            # the REAL serving path: int8 + block-cache, vs the exact chain
            qcos, qrel = _cos_rel(np.asarray(timed(qp, z0), np.float64), lat_exact)
            row["int8_cos"], row["int8_rel"] = round(qcos, 4), round(qrel, 4)
            line += f" {qcos:>9.4f} {qrel:>9.4f}"
        rows.append(row)
        print(line)

    if args.out:
        payload = {"weights": weights, "protocol": "XL/2 DDIM-50 16f 256² B=1",
                   "rows": rows}
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
