"""Per-category device-time table for the XL/2 DDIM step (bf16 or int8).

Traces N steps with jax.profiler, parses the xplane proto with
latte_tpu.tools.xplane (no tensorflow needed), and buckets the leaf-fusion
exclusive times into the docs/tpu_notes.md roofline categories. Usage:

    PYTHONPATH=... python scripts/trace_categories.py [--int8] [--fused]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import re
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (shared with bench.py / the sweep children) —
# XL train-step compiles are ~10 min fresh through the relay
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_CACHE_DIR", "/tmp/latte_tpu_jax_cache"),
    )
except Exception:
    pass

from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_model
from latte_tpu.tools.xplane import device_op_totals, find_xplane, parse_xspace

CATEGORIES = [
    # (bucket, regex over the HLO fusion display name)
    ("attention core", re.compile(r"softmax|attn|logits|reduce_max|exponential|divide.*reduce|dot.*bhnm|transpose.*dot", re.I)),
    ("matmul", re.compile(r"^(dot|fusion.*dot|convolution)|dot_general", re.I)),
    ("layernorm/modulate", re.compile(r"norm|rsqrt|modulate|variance|mean", re.I)),
    ("quantize/dequant", re.compile(r"clamp|round|abs|quant|convert", re.I)),
    ("copies/transposes", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--static", action="store_true", help="static-scale W8A8")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument(
        "--train", action="store_true",
        help="trace the fused TRAIN step (fwd+bwd+AdamW+EMA) instead of "
        "the DDIM serving step — the training-roofline companion",
    )
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument(
        "--remat", default="full", choices=["full", "dots", "none"],
        help="train-mode remat policy (ffs_train.yaml default: full)",
    )
    ap.add_argument(
        "--scan", action="store_true",
        help="train-mode: keep the scanned pair stack instead of the "
        "shipped single-chip unroll (shows the weight-slice copy stall)",
    )
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--top", type=int, default=35)
    args = ap.parse_args()

    rng = jax.random.PRNGKey(0)
    if args.train:
        from latte_tpu.train import create_train_state, make_train_step
        from latte_tpu.train.state import make_optimizer

        model = get_model(
            "Latte-XL/2",
            input_size=32,
            num_frames=16,
            extras=1,
            learn_sigma=True,
            attention_mode="auto",
            unroll_blocks=not args.scan,
            gradient_checkpointing=args.remat != "none",
            remat_policy="full" if args.remat == "none" else args.remat,
            quantized="train" if args.int8 else False,
            dtype=jnp.bfloat16,
        )
        opt = make_optimizer(lr=1e-4)
        tr_step = jax.jit(
            make_train_step(
                model, create_diffusion("", diffusion_steps=1000), opt
            ),
            donate_argnums=(0,),
        )
        x_shape = (args.batch, 16, 4, 32, 32)

        # REAL initializers: a uniform fill overflows the first backward
        # (see scripts/bench_train_sweep.py); params are batch-independent
        @jax.jit
        def init_state():
            pr = model.init(
                {"params": rng},
                jnp.zeros((1,) + x_shape[1:], jnp.float32),
                jnp.zeros((1,), jnp.int32),
            )
            return create_train_state(pr["params"], opt)

        state = init_state()
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
        }
        compiled = tr_step.lower(state, batch, jax.random.PRNGKey(2)).compile()
        state, m = tr_step(state, batch, jax.random.PRNGKey(2))  # compile
        assert np.isfinite(float(m["loss"]))
    else:
        model = get_model(
            "Latte-XL/2",
            input_size=32,
            num_frames=16,
            extras=1,
            learn_sigma=True,
            attention_mode="auto",
            unroll_blocks=True,
            fused_adaln=args.fused,
            quantized="static" if args.static else args.int8,
            dtype=jnp.bfloat16,
        )
        diffusion = create_diffusion("ddim50")
        x_shape = (1, 16, 4, 32, 32)
        shapes = jax.eval_shape(
            lambda: model.init(
                {"params": rng}, jnp.zeros(x_shape, jnp.float32), jnp.zeros((1,), jnp.int32)
            )
        )

        @jax.jit
        def init_p():
            def mk(s):
                if s.dtype == jnp.int8:
                    return jnp.zeros(s.shape, jnp.int8)
                if s.dtype == jnp.float32:
                    return jnp.full(s.shape, 0.01, jnp.float32)
                return jnp.zeros(s.shape, jnp.bfloat16)

            return jax.tree_util.tree_map(mk, shapes)

        p = init_p()

        @jax.jit
        def ddim_step(pp, x, t_scalar):
            t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
            return diffusion.ddim_sample(
                lambda xx, tt: model.apply(pp, xx, tt), x, t, jnp.zeros_like(x)
            )["sample"]

        z = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
        tsc = jnp.int32(49)
        compiled = ddim_step.lower(p, z, tsc).compile()
        z = ddim_step(p, z, tsc)
        np.asarray(z[0, 0, 0, 0, 0])  # compile

    # ---- map fusion names -> what's inside them, from the optimized HLO
    hlo = compiled.as_text()
    # fusion USES: %fusion.N = <ty> fusion(...), kind=..., calls=%comp
    fusion_calls = {}
    for m in re.finditer(
        r"%?([\w.-]+) = \S+ fusion\([^\n]*?calls=%?([\w.-]+)", hlo
    ):
        fusion_calls[m.group(1)] = m.group(2)
    # computation bodies: ops inside each fused computation
    comp_ops = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"%?([\w.-]+) (?:\([^)]*\) )?-> .* {$|^(ENTRY|HloModule)", line)
        mm = re.match(r"\s*%?([\w.-]+)\s*(?:\([^)]*\))?\s*->.*\{", line)
        if mm and not line.startswith(" "):
            cur = mm.group(1)
            comp_ops[cur] = []
        elif cur and line.startswith("}"):
            cur = None
        elif cur:
            om = re.match(r"\s+%?[\w.-]+ = \S+ ([\w-]+)\(", line)
            if om:
                comp_ops[cur].append(om.group(1))

    def describe(name: str) -> str:
        comp = fusion_calls.get(name)
        if comp is None or comp not in comp_ops:
            return ""
        ops = comp_ops[comp]
        from collections import Counter

        keep = Counter(
            o
            for o in ops
            if o
            not in (
                "parameter",
                "constant",
                "broadcast",
                "bitcast",
                "tuple",
                "get-tuple-element",
            )
        )
        return ",".join(f"{k}x{v}" for k, v in keep.most_common(6))

    logdir = tempfile.mkdtemp(prefix="latte_trace_")
    with jax.profiler.trace(logdir):
        if args.train:
            for i in range(args.steps):
                state, m = tr_step(state, batch, jax.random.PRNGKey(3 + i))
            assert np.isfinite(float(m["loss"]))
        else:
            for _ in range(args.steps):
                z = ddim_step(p, z, tsc)
            np.asarray(z[0, 0, 0, 0, 0])

    path = find_xplane(logdir)
    planes = parse_xspace(path)
    totals = device_op_totals(planes)
    n = args.steps

    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    total_ms = sum(v[0] for v in totals.values())
    print(f"trace: {path}")
    print(f"device total {total_ms:.1f} ms over {n} steps = {total_ms/n:.2f} ms/step")
    # async DMA queues run concurrently with the compute line — report the
    # overlap separately (its total exceeding the wall step is parallelism,
    # not serial cost; see tools/xplane.device_op_totals)
    atot = device_op_totals(planes, async_lines=True)
    if atot:
        ams = sum(v[0] for v in atot.values())
        acnt = sum(v[1] for v in atot.values())
        print(
            f"async DMA overlap {ams/n:.1f} ms/step across {acnt//n} "
            f"copies/step (concurrent with compute, not additive)"
        )
    print()
    print(f"{'ms/step':>8}  {'count':>6}  name / fused ops")
    for name, (ms, cnt) in rows[: args.top]:
        print(f"{ms/n:8.3f}  {cnt:6d}  {name[:40]:40s} {describe(name)[:80]}")

    # bucket by fused-op content (falls back to name regexes)
    def bucket_of(name: str) -> str:
        desc = describe(name)
        if args.train and (
            name.startswith("multiply_add_fusion")
            or name.startswith("multiply_reduce_fusion")
        ):
            # the AdamW/EMA elementwise chains (m/v updates, master-weight
            # fma, EMA lerp) and the grad-norm partial reductions — pure
            # HBM bandwidth over the fp32 state, no dots
            return "optimizer/EMA/grad-norm"
        if "copy" in name or "copy-start" in desc:
            return "dma/copies"
        if "dot" in desc or "convolution" in desc:
            return "matmul(+fused epilogue)"
        if "exponential" in desc or "softmax" in name:
            return "softmax"
        if "rsqrt" in desc or "norm" in name:
            return "layernorm/modulate"
        if "reduce" in desc:
            return "reductions"
        if "transpose" in desc or "transpose" in name or "slice" in name:
            return "layout/slices"
        for bucket, rx in CATEGORIES:
            if rx.search(name):
                return bucket
        return "other"

    buckets = {}
    for name, (ms, cnt) in totals.items():
        b = bucket_of(name)
        buckets[b] = buckets.get(b, 0.0) + ms
    print("\nper-category ms/step:")
    for bucket, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {bucket:24s} {ms/n:7.3f}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
