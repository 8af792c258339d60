"""Training-throughput sweep: batch size x remat policy at bf16.

The serving path got a full xplane roofline (docs/tpu_notes.md "MFU
roofline"); this is the training-side companion the round-4 review asked
for. It times the fused jitted train step (fwd + bwd + AdamW + EMA,
`latte_tpu/train/step.py`) on synthetic latents at Latte-XL/2 16f 256**2
across batch {1,2,4,8} x remat {full, dots, none}, reporting steps/s,
videos/s (= steps/s * batch) and the implied MFU so the 33% figure from
the headline 5.8 steps/s @ B=1 gets explained or fixed, not just quoted.

Per-config xplane category tables come from the companion
`scripts/trace_categories.py --train --batch N --remat P`.

Run on-chip: python scripts/bench_train_sweep.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache shared across the per-config child processes —
# unrolled XL train-step compiles are minutes each through the relay
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_CACHE_DIR", "/tmp/latte_tpu_jax_cache"),
    )
except Exception:
    pass

from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.models import get_model
from latte_tpu.train import create_train_state, make_train_step
from latte_tpu.train.state import make_optimizer

ITERS = 20

# fwd FLOPs for Latte-XL/2 16f 256**2 per sample, from
# profiling.cost_analysis at B=1 (docs/tpu_notes.md): ~3.72 TFLOP.
# Training ~= 3x fwd (fwd + 2x in bwd); optimizer/EMA are bandwidth, not
# FLOPs. Peak for v5e MXU bf16: 197 TFLOP/s.
FWD_TFLOP = 3.72
PEAK_TFLOPS = 197.0


def bench_one(
    batch_size: int,
    remat: str,
    unroll: bool = False,
    mu_bf16: bool = False,
    ema_every: int = 1,
) -> dict:
    model = get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=16,
        extras=1,
        learn_sigma=True,
        attention_mode="auto",
        unroll_blocks=unroll,
        gradient_checkpointing=remat != "none",
        remat_policy="full" if remat == "none" else remat,
        dtype=jnp.bfloat16,
    )
    opt = make_optimizer(lr=1e-4, mu_dtype=jnp.bfloat16 if mu_bf16 else None)
    step = jax.jit(
        make_train_step(
            model,
            create_diffusion("", diffusion_steps=1000),
            opt,
            ema_every=ema_every,
        ),
        donate_argnums=(0,),
    )
    rng = jax.random.PRNGKey(0)
    x_shape = (batch_size, 16, 4, 32, 32)

    # REAL initializers, not placeholder fills: a uniform 0.01 fill makes
    # every dense a row-summer, residuals grow multiplicatively over the
    # 28 blocks and the first backward overflows (measured: mse 8.6e5 at
    # step 0, grad_norm NaN). Training timing needs a numerically live
    # network; init cost is one extra compile. Params don't depend on the
    # batch size, so init at B=1.
    @jax.jit
    def init_state():
        p = model.init(
            {"params": rng},
            jnp.zeros((1,) + x_shape[1:], jnp.float32),
            jnp.zeros((1,), jnp.int32),
        )
        return create_train_state(p["params"], opt)

    state = init_state()
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
    }
    state, m = step(state, batch, jax.random.PRNGKey(2))  # compile
    if not np.isfinite(float(m["loss"])):
        raise RuntimeError("non-finite loss")
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, batch, jax.random.PRNGKey(3 + i))
    lossv = float(m["loss"])  # forces the chain
    dt = time.perf_counter() - t0
    assert np.isfinite(lossv)
    sps = ITERS / dt
    tflops = 3.0 * FWD_TFLOP * batch_size * sps
    return {
        "steps_per_s": round(sps, 2),
        "ms_per_step": round(1e3 / sps, 1),
        "videos_per_s": round(sps * batch_size, 2),
        "mfu_pct": round(100.0 * tflops / PEAK_TFLOPS, 1),
    }


def main():
    import argparse
    import json
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--one", nargs=2, metavar=("BATCH", "REMAT"), default=None)
    ap.add_argument(
        "--unroll", action="store_true",
        help="python-unrolled block pairs instead of lax.scan over stacked "
        "weights (the B=1 trace shows ~1760 small async copies/step from "
        "scan's weight slicing + grad dynamic-update-slices)",
    )
    ap.add_argument(
        "--mu-bf16", action="store_true",
        help="store the Adam first moment in bf16 (adam_mu_dtype: bfloat16)",
    )
    ap.add_argument(
        "--ema-every", type=int, default=1,
        help="EMA refresh every K steps at decay^K (ema_every: K)",
    )
    args = ap.parse_args()

    if args.one:
        # child mode: one config per process — isolates OOMs and keeps the
        # relay compile service to one big program at a time (a dozen
        # XL-train compiles in one process produced HTTP 500s from the
        # remote compiler)
        r = bench_one(
            int(args.one[0]), args.one[1], unroll=args.unroll,
            mu_bf16=args.mu_bf16, ema_every=args.ema_every,
        )
        print("RESULT " + json.dumps(r))
        return

    print("backend:", jax.default_backend())
    print(f"{'batch':>5} {'remat':>6} {'ms/step':>8} {'steps/s':>8} "
          f"{'videos/s':>9} {'MFU%':>6}", flush=True)
    for remat in ("full", "dots", "none"):
        for b in (1, 2, 4, 8):
            try:
                cmd = [_sys.executable, _os.path.abspath(__file__), "--one", str(b), remat]
                if args.unroll:
                    cmd.append("--unroll")
                if args.mu_bf16:
                    cmd.append("--mu-bf16")
                if args.ema_every != 1:
                    cmd += ["--ema-every", str(args.ema_every)]
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=900,
                )
            except subprocess.TimeoutExpired:
                print(f"{b:>5} {remat:>6}   FAILED: compile/run >900s", flush=True)
                continue
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("RESULT ")),
                None,
            )
            if proc.returncode == 0 and line:
                r = json.loads(line[len("RESULT "):])
                print(
                    f"{b:>5} {remat:>6} {r['ms_per_step']:>8} "
                    f"{r['steps_per_s']:>8} {r['videos_per_s']:>9} "
                    f"{r['mfu_pct']:>6}", flush=True,
                )
            else:  # OOM at large batch without remat, or compile failure
                err = proc.stderr or proc.stdout
                oom = next(
                    (l for l in err.splitlines() if "Ran out of memory" in l),
                    None,
                )
                if oom:
                    msg = "OOM: " + oom[oom.index("Ran out of memory"):][:90]
                else:
                    tail = [
                        l for l in err.strip().splitlines()
                        if l.strip() and "For simplicity" not in l
                    ]
                    msg = tail[-1][:110] if tail else f"rc={proc.returncode}"
                print(f"{b:>5} {remat:>6}   FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
