"""Headline benchmark: videos/min/chip for 16-frame 256² 50-step DDIM
sampling with Latte-XL/2 (the reference's flagship unconditional protocol,
`configs/ffs/ffs_sample.yaml`; BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no throughput number (BASELINE.md),
and no A100 is available here, so ``A100_EST_VIDEOS_PER_MIN`` is a derived
estimate, documented inline: Latte-XL/2 forward ≈ 16 TFLOPs for a 16-frame
32×32-latent clip (28 blocks × ~24·D²·tokens + attention), 50 DDIM steps
→ ≈ 0.8 PFLOPs/video; A100 fp16 peak 312 TFLOP/s at ~30% eager-PyTorch
utilization → ≈ 94 TFLOP/s → ≈ 8.5 s/video ≈ 7 videos/min/GPU.
"""

from __future__ import annotations

import json
import time

A100_EST_VIDEOS_PER_MIN = 7.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.core.samplers import ddim_sample_loop
    from latte_tpu.models import get_model

    batch = 2  # matches the reference's per-proc DDP sampling batch
    model = get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=16,
        extras=1,
        learn_sigma=True,
        attention_mode="auto",
        dtype=jnp.bfloat16,
    )
    diffusion = create_diffusion("ddim50")

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, 16, 4, 32, 32), jnp.float32)
    t0 = jnp.zeros((batch,), jnp.int32)
    # Everything stays under jit: eager op-by-op dispatch (init, per-leaf
    # casts) is pathologically slow on remote-attached TPU backends.
    @jax.jit
    def init_bf16():
        v = model.init({"params": rng}, x, t0)
        return jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)

    params = init_bf16()

    def model_fn(xx, tt):
        return model.apply(params, xx, tt)

    # host-driven loop: one jitted DDIM step dispatched 50x. The scan-mode
    # single-program loop is preferred on directly-attached pods, but
    # remote-attached backends compile nested while-loops pathologically.
    def sample(z):
        return ddim_sample_loop(diffusion, model_fn, z, loop="host")

    z = jax.random.normal(jax.random.PRNGKey(1), x.shape, dtype=jnp.float32)
    # Warmup/compile.
    jax.block_until_ready(sample(z))

    n_iters = 3
    start = time.perf_counter()
    for i in range(n_iters):
        out = sample(z)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    videos_per_min = batch * n_iters * 60.0 / elapsed
    print(
        json.dumps(
            {
                "metric": "videos/min/chip (Latte-XL/2 16f 256², DDIM-50)",
                "value": round(videos_per_min, 3),
                "unit": "videos/min/chip",
                "vs_baseline": round(videos_per_min / A100_EST_VIDEOS_PER_MIN, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
