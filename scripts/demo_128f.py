"""128-frame flagship demo — the `fvd2048_128f` protocol length end-to-end.

The reference's long-video evaluation protocol samples 128-frame clips
(`/root/reference/tools/metrics/metric_main.py:121-132`); this script
demonstrates the two ways this framework covers that length:

  --mode chip   Latte-XL/2, 256², 128 frames, DDIM-50, bf16, on the real
                single chip (attention_mode="auto"): records videos/min.
  --mode mesh   128 frames through attention_mode="ring" on an 8-device
                virtual CPU mesh (temporal sequences F=128 ring-sharded
                over ICI in 16-frame shards; spatial N=256 likewise):
                execution evidence for the single-sequence scaling path.

Weights are random — throughput and the ring execution path are
value-independent. Appends one JSON line per run to runs/demo128f/log.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log_result(rec: dict) -> None:
    out_dir = os.path.join(REPO, "runs", "demo128f")
    os.makedirs(out_dir, exist_ok=True)
    rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(out_dir, "log.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def run_chip(steps: int, n_runs: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/latte_tpu_jax_cache")
    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.models import get_model

    model = get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=128,
        extras=1,
        learn_sigma=True,
        attention_mode="auto" if jax.default_backend() == "tpu" else "xla",
        dtype=jnp.bfloat16,
    )
    diffusion = create_diffusion(f"ddim{steps}")
    x_shape = (1, 128, 4, 32, 32)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng}, jnp.zeros(x_shape, jnp.float32),
            jnp.zeros((1,), jnp.int32),
        )
    )
    params = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes
        )
    )()

    ts_arr = jnp.arange(diffusion.num_timesteps - 1, -1, -1, jnp.int32)

    @jax.jit
    def sample_scan(p, z):
        def body(zc, t_scalar):
            t = jnp.full((zc.shape[0],), t_scalar, jnp.int32)
            out = diffusion.ddim_sample(
                lambda xx, tt: model.apply(p, xx, tt), zc, t, jnp.zeros_like(zc)
            )["sample"]
            return out, None

        zf, _ = jax.lax.scan(body, z, ts_arr)
        return zf

    z = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
    t0 = time.perf_counter()
    val = np.asarray(sample_scan(params, z)[0, 0, 0, 0, 0])  # compile + run
    compile_s = time.perf_counter() - t0
    assert np.isfinite(val)

    t0 = time.perf_counter()
    for i in range(n_runs):
        z = sample_scan(params, z)
    val = np.asarray(z[0, 0, 0, 0, 0])  # materialize: bounds the whole chain
    elapsed = time.perf_counter() - t0
    assert np.isfinite(val)
    log_result(
        {
            "mode": "chip",
            "model": "Latte-XL/2",
            "frames": 128,
            "image_size": 256,
            "sampler": f"ddim{steps}",
            "backend": jax.default_backend(),
            "videos_per_min": round(n_runs * 60.0 / elapsed, 3),
            "sec_per_video": round(elapsed / n_runs, 2),
            "compile_plus_first_s": round(compile_s, 1),
        }
    )


def run_mesh(steps: int) -> None:
    # virtual CPU mesh: must win the platform race against the TPU plugin
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.models import get_model

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    # S-width keeps the CPU run in minutes; the point is the 128-frame ring
    # path (F=128 -> 16-frame K/V shards rotating over the 8-device ring)
    model = get_model(
        "Latte-S/2",
        input_size=8,
        num_frames=128,
        extras=1,
        learn_sigma=True,
        attention_mode="ring",
        ring_mesh=mesh,
        ring_axis="sp",
    )
    diffusion = create_diffusion(f"ddim{steps}")
    x_shape = (1, 128, 4, 8, 8)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng}, jnp.zeros(x_shape, jnp.float32), jnp.zeros((1,), jnp.int32)
    )

    @jax.jit
    def ddim_step(p, x, t_scalar):
        t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
        return diffusion.ddim_sample(
            lambda xx, tt: model.apply(p, xx, tt), x, t, jnp.zeros_like(x)
        )["sample"]

    z = jax.random.normal(jax.random.PRNGKey(1), x_shape, jnp.float32)
    t0 = time.perf_counter()
    for t_scalar in range(diffusion.num_timesteps - 1, -1, -1):
        z = ddim_step(params, z, jnp.int32(t_scalar))
    lat = np.asarray(z)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(lat).all()
    log_result(
        {
            "mode": "mesh-ring",
            "model": "Latte-S/2",
            "frames": 128,
            "devices": 8,
            "mesh_axes": "sp=8",
            "sampler": f"ddim{steps}",
            "backend": jax.default_backend(),
            "wall_s_incl_compile": round(elapsed, 1),
            "latent_std": round(float(lat.std()), 4),
        }
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["chip", "mesh"], required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    if args.mode == "chip":
        run_chip(args.steps or 50, args.runs)
    else:
        run_mesh(args.steps or 10)
