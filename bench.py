"""Headline benchmark: videos/min/chip for 16-frame 256² 50-step DDIM
sampling with Latte-XL/2 (the reference's flagship unconditional protocol,
`configs/ffs/ffs_sample.yaml`; BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (remote-attached TPU):
- everything runs under jit (eager dispatch is ~100ms/op through the relay);
- the sampling chain is value-dependent step-to-step and the final latents
  are materialized to host, so the timing cannot be faked by async dispatch
  (`block_until_ready` is unreliable through the relay);
- the DDIM loop is measured both host-driven (one jitted step, 50
  dispatches) and as one on-device `lax.scan` (single dispatch; the
  round-1 relay compiler rejected this, current one accepts it and it is
  slightly faster) — the headline takes the better of the two, both are
  reported in `extra`.

Baseline: the reference repo publishes no throughput number (BASELINE.md),
and no A100 is available here, so ``A100_EST_VIDEOS_PER_MIN`` is a derived
estimate, documented inline: Latte-XL/2 forward ≈ 16 TFLOPs for a 16-frame
32×32-latent clip (28 blocks × 24·D²·tokens + attention), 50 DDIM steps
→ ≈ 0.8 PFLOPs/video; A100 fp16 312 TFLOP/s peak at ~30% eager-PyTorch
utilization → ≈ 94 TFLOP/s → ≈ 8.5 s/video ≈ 7 videos/min/GPU.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_EST_VIDEOS_PER_MIN = 7.0
# batch sweep (docs/tpu_notes.md): B=1 gives the best videos/min on this
# chip (29 ms/fwd; larger batches drop below 520 TFLOP/s sustained)
BATCH = 1
STEPS = 50


def main() -> None:
    import os
    import signal
    import sys

    import jax
    import jax.numpy as jnp

    # --- robustness for unattended (driver) runs: the full bench is many
    # multi-minute compile+measure sections; if the harness times out and
    # SIGTERMs us mid-section, everything measured so far must still reach
    # stdout as the one JSON line. Likewise a soft time budget skips
    # not-yet-started sections once exceeded (the headline always runs).
    t_start = time.monotonic()
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET_S", "2400"))
    hl = {"vpm": 0.0, "emitted": False}
    extra = {}

    def emit(partial: bool = False) -> None:
        if hl["emitted"]:
            return
        hl["emitted"] = True
        if partial:
            extra["partial"] = True
        print(
            json.dumps(
                {
                    "metric": (
                        "videos/min/chip (Latte-XL/2 16f 256², DDIM-50, latents)"
                    ),
                    "value": round(hl["vpm"], 3),
                    "unit": "videos/min/chip",
                    "vs_baseline": round(hl["vpm"] / A100_EST_VIDEOS_PER_MIN, 3),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    def on_term(signum, frame):
        extra["partial_reason"] = (
            f"signal {signum} at {round(time.monotonic() - t_start)}s"
        )
        emit(partial=True)
        sys.exit(1)

    signal.signal(signal.SIGTERM, on_term)

    def budget_ok(section: str) -> bool:
        if time.monotonic() - t_start < budget_s:
            return True
        extra.setdefault("skipped_over_budget", []).append(section)
        return False

    class SkipSection(Exception):
        """Raised at a section head once the soft time budget is spent."""

    def check_budget(section: str) -> None:
        if not budget_ok(section):
            raise SkipSection(section)

    def record_err(key: str, e: Exception) -> None:
        if not isinstance(e, SkipSection):
            extra[key] = repr(e)[:160]

    # persistent compile cache: repeat driver runs skip the ~20s compiles
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/latte_tpu_jax_cache"),
        )
    except Exception:
        pass

    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.models import get_model

    on_tpu = jax.default_backend() == "tpu"

    rng = jax.random.PRNGKey(0)
    x_shape = (BATCH, 16, 4, 32, 32)
    t0c = jnp.zeros((BATCH,), jnp.int32)

    # --- training throughput FIRST, while the chip is empty: the fused
    # jitted train step (fwd + bwd + AdamW + EMA, `train/step.py`) on
    # synthetic latents at the production config — XL/2, B=1, bf16 compute
    # over fp32 masters, full remat (ffs_train.yaml
    # gradient_checkpointing). Tracked per round like serving so
    # train-side regressions show in BENCH_rN. Category breakdown +
    # batch/remat sweep: docs/tpu_notes.md "training roofline".
    #
    # Ordering is load-bearing: the train state (params + fp32 masters +
    # Adam moments + EMA, ~11 GB at XL) needs the chip nearly empty —
    # running it after the serving sections RESOURCE_EXHAUSTED even with
    # their param trees explicitly del'd (fragmentation + live jit
    # constants; measured twice).
    if os.environ.get("BENCH_QUICK", "") != "1":
        try:
            from latte_tpu.train import create_train_state, make_train_step
            from latte_tpu.train.state import make_optimizer

            tr_model = get_model(
                "Latte-XL/2",
                input_size=32,
                num_frames=16,
                extras=1,
                learn_sigma=True,
                attention_mode="auto" if on_tpu else "xla",
                # the shipped single-chip default (train.py auto-unroll):
                # scan's weight-slice copies cost 26% (170.5 -> 135.3
                # ms/step, docs/tpu_notes.md "training roofline")
                unroll_blocks=on_tpu,
                gradient_checkpointing=True,
                dtype=jnp.bfloat16,
            )
            tr_opt = make_optimizer(lr=1e-4)
            tr_step = jax.jit(
                make_train_step(
                    tr_model, create_diffusion("", diffusion_steps=1000), tr_opt
                ),
                donate_argnums=(0,),
            )
            # REAL initializers (unlike the serving benches' fills): a
            # uniform fill makes every dense a row-summer, residuals grow
            # multiplicatively over the 28 blocks and the first backward
            # overflows (measured: mse 8.6e5 at step 0, grad_norm NaN)
            @jax.jit
            def tr_init():
                p = tr_model.init(
                    {"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c
                )
                return create_train_state(p["params"], tr_opt)

            tr_state = tr_init()
            batch = {
                "latents": jax.random.normal(
                    jax.random.PRNGKey(17), x_shape, jnp.float32
                )
            }
            tr_state, m = tr_step(tr_state, batch, jax.random.PRNGKey(18))
            assert np.isfinite(float(m["loss"]))  # compile + sanity
            TR_ITERS = 20
            t0 = time.perf_counter()
            for i in range(TR_ITERS):
                tr_state, m = tr_step(tr_state, batch, jax.random.PRNGKey(19 + i))
            lossv = float(m["loss"])  # forces the chain
            tr_dt = time.perf_counter() - t0
            assert np.isfinite(lossv)
            extra["train_steps_per_s"] = round(TR_ITERS / tr_dt, 2)
            # free the ~11 GB train state before the serving sections
            del tr_state, tr_step, tr_init, batch, m
        except Exception as e:
            extra["bench_train_error"] = repr(e)[:160]
        import gc

        gc.collect()

    model = get_model(
        "Latte-XL/2",
        input_size=32,
        num_frames=16,
        extras=1,
        learn_sigma=True,
        attention_mode="auto" if on_tpu else "xla",
        unroll_blocks=on_tpu,
        dtype=jnp.bfloat16,
    )
    diffusion = create_diffusion(f"ddim{STEPS}")

    # Throughput benching doesn't need trained values; zero-filled params of
    # the exact shapes avoid a multi-minute random-init execution through
    # the remote relay (matmul cost is value-independent).
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c)
    )

    @jax.jit
    def init_bf16():
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes
        )

    params = init_bf16()

    # one jitted DDIM step, reused across all timesteps & runs. Params are
    # an ARGUMENT (closing over device arrays bakes GBs of constants into
    # the HLO and stalls compilation).
    @jax.jit
    def ddim_step(p, x, t_scalar):
        def model_fn(xx, tt):
            return model.apply(p, xx, tt)

        t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
        return diffusion.ddim_sample(model_fn, x, t, jnp.zeros_like(x))["sample"]

    # pre-created device scalars: eager array creation inside the timed
    # loop costs more than the dispatch itself on the relay
    ts = [jnp.int32(t) for t in range(diffusion.num_timesteps - 1, -1, -1)]

    def run(seed: int):
        z = jax.random.normal(jax.random.PRNGKey(seed), x_shape, jnp.float32)
        for t_scalar in ts:
            z = ddim_step(params, z, t_scalar)
        return np.asarray(z[0, 0, 0, 0, 0])  # force materialization

    run(1)  # warmup/compile

    n_runs = 3
    start = time.perf_counter()
    for i in range(n_runs):
        val = run(2 + i)
    elapsed = time.perf_counter() - start
    assert np.isfinite(val)

    videos_per_min = BATCH * n_runs * 60.0 / elapsed
    hl["vpm"] = videos_per_min
    extra["videos_per_min_host_loop"] = round(videos_per_min, 3)

    # --- fully on-device sampler: the whole DDIM chain as one lax.scan
    # (one dispatch per video, zero host involvement). The round-1 relay
    # compiler rejected a while-loop around the XL model; it compiles now.
    def make_scan_sampler(m):
        ts_arr = jnp.arange(diffusion.num_timesteps - 1, -1, -1, jnp.int32)

        @jax.jit
        def sample_scan(p, z):
            def body(zc, t_scalar):
                t = jnp.full((zc.shape[0],), t_scalar, jnp.int32)
                out = diffusion.ddim_sample(
                    lambda xx, tt: m.apply(p, xx, tt), zc, t, jnp.zeros_like(zc)
                )["sample"]
                return out, None

            zf, _ = jax.lax.scan(body, z, ts_arr)
            return zf

        return sample_scan

    try:
        scan_model = model.clone(unroll_blocks=False)
        sample_scan = make_scan_sampler(scan_model)
        z = jax.random.normal(jax.random.PRNGKey(9), x_shape, jnp.float32)
        np.asarray(sample_scan(params, z)[0, 0, 0, 0, 0])  # compile
        t0 = time.perf_counter()
        for i in range(n_runs):
            z = sample_scan(params, z)
        val2 = np.asarray(z[0, 0, 0, 0, 0])
        scan_elapsed = time.perf_counter() - t0
        assert np.isfinite(val2)
        scan_vpm = BATCH * n_runs * 60.0 / scan_elapsed
        extra["videos_per_min_scan_loop"] = round(scan_vpm, 3)
        if scan_vpm > videos_per_min:
            videos_per_min, elapsed = scan_vpm, scan_elapsed
            hl["vpm"] = videos_per_min
    except Exception as e:
        extra["scan_loop_error"] = repr(e)[:120]

    if os.environ.get("BENCH_QUICK", "") != "1":
        # --- model FLOPs (XLA cost analysis of the compiled DDIM step) and
        # MFU against the public TPU v5e bf16 peak (197 TFLOP/s/chip). The
        # FLOP count is the compiler's own estimate for the whole step
        # (model fwd + schedule algebra), not a hand formula.
        try:
            compiled = ddim_step.lower(
                params, jnp.zeros(x_shape, jnp.float32), ts[0]
            ).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            step_flops = float(ca.get("flops", 0.0))
            if step_flops > 0:
                # step_flops is for the WHOLE (BATCH, ...) step — divide by
                # per-trajectory seconds (not per-video) or BATCH>1 would
                # inflate the rate BATCH-fold
                sec_per_traj = elapsed / n_runs
                achieved = step_flops * STEPS / sec_per_traj
                extra["step_tflops_xla"] = round(step_flops / 1e12, 3)
                extra["achieved_tflops_per_s"] = round(achieved / 1e12, 1)
                extra["mfu_pct_vs_v5e_bf16_197T"] = round(
                    100.0 * achieved / 197e12, 1
                )
        except Exception as e:  # relay backends may not expose cost analysis
            extra["mfu_error"] = repr(e)[:120]

        # --- W8A8 int8 serving: same DDIM protocol with the STATIC-scale
        # quantized model (weights int8 per-output-channel offline;
        # activations int8 with CALIBRATED per-tensor scales, so the
        # quantize fuses into each producer — no dynamic amax pass).
        # Measured r4 (interleaved A/B/A, scripts/bench_int8_ab.py):
        # static 22.6 ms/step vs dynamic 23.8 vs bf16 32.8 on the same
        # relay session. Constant-baked weights and 2D-flattened dots were
        # both tried and do NOT win (docs/tpu_notes.md, round-4 int8 notes).
        try:
            check_budget("int8")
            qmodel = model.clone(quantized="static")
            qshapes = jax.eval_shape(
                lambda: qmodel.init(
                    {"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c
                )
            )

            @jax.jit
            def init_q():
                def mk(s):
                    if s.dtype == jnp.int8:
                        return jnp.zeros(s.shape, jnp.int8)
                    if s.dtype == jnp.float32:
                        return jnp.full(s.shape, 0.01, jnp.float32)
                    return jnp.zeros(s.shape, jnp.bfloat16)

                return jax.tree_util.tree_map(mk, qshapes)

            qparams = init_q()

            try:  # on-device scan loop first, host loop as fallback
                q_scan = make_scan_sampler(qmodel.clone(unroll_blocks=False))
                zq = jax.random.normal(jax.random.PRNGKey(5), x_shape, jnp.float32)
                np.asarray(q_scan(qparams, zq)[0, 0, 0, 0, 0])  # compile
                t0 = time.perf_counter()
                for i in range(n_runs):
                    zq = q_scan(qparams, zq)
                vq = np.asarray(zq[0, 0, 0, 0, 0])
                q_elapsed = (time.perf_counter() - t0) / n_runs
            except Exception:
                @jax.jit
                def ddim_step_q(p, x, t_scalar):
                    def model_fn(xx, tt):
                        return qmodel.apply(p, xx, tt)

                    t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
                    return diffusion.ddim_sample(
                        model_fn, x, t, jnp.zeros_like(x)
                    )["sample"]

                def run_q(seed: int):
                    z = jax.random.normal(
                        jax.random.PRNGKey(seed), x_shape, jnp.float32
                    )
                    for t_scalar in ts:
                        z = ddim_step_q(qparams, z, t_scalar)
                    return np.asarray(z[0, 0, 0, 0, 0])

                run_q(1)
                t0 = time.perf_counter()
                vq = run_q(2)
                q_elapsed = time.perf_counter() - t0
            assert np.isfinite(vq)
            extra["videos_per_min_int8_serving"] = round(
                BATCH * 60.0 / q_elapsed, 3
            )
            extra["int8_mode"] = "static-W8A8"

        except Exception as e:
            record_err("int8_error", e)

        try:
            check_budget("int8_quality")
            # --- int8 end-task quality guard: identical x_T through the
            # bf16 and static-int8 DDIM-50 chains with SHARED random
            # weights (the timing runs above use zero weights —
            # value-independent for speed, useless for quality). Runs the
            # full static serving recipe: a calibration forward sows
            # per-layer activation amax, quantize_params folds it into
            # act_scale leaves. The compiled samplers are reused.
            from latte_tpu.quant import quantize_params

            leaves, treedef = jax.tree_util.tree_flatten(shapes)

            @jax.jit
            def init_rand():
                ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
                return jax.tree_util.tree_unflatten(
                    treedef,
                    [
                        jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
                        for k, s in zip(ks, leaves)
                    ],
                )

            rparams = init_rand()
            cmodel = model.clone(quantized="calib", unroll_blocks=False)
            zc = jax.random.normal(jax.random.PRNGKey(11), x_shape, jnp.float32)

            @jax.jit
            def calib_amax(p, x, t_scalar):
                t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
                _, variables = cmodel.apply(p, x, t, mutable=["calib"])
                return variables["calib"]

            from latte_tpu.quant import merge_amax

            amax = None
            for tc in (999, 500, 0):  # representative timesteps
                amax = merge_amax(amax, calib_amax(rparams, zc, jnp.int32(tc)))
            rqparams = {
                "params": quantize_params(rparams["params"], act_amax=amax)
            }
            zq0 = jax.random.normal(jax.random.PRNGKey(11), x_shape, jnp.float32)
            lat_bf16 = np.asarray(sample_scan(rparams, zq0), np.float64)
            lat_int8 = np.asarray(q_scan(rqparams, zq0), np.float64)
            if np.isfinite(lat_bf16).all() and np.isfinite(lat_int8).all():
                cos = float(
                    (lat_bf16 * lat_int8).sum()
                    / (np.linalg.norm(lat_bf16) * np.linalg.norm(lat_int8) + 1e-12)
                )
                rel = float(
                    np.linalg.norm(lat_int8 - lat_bf16)
                    / (np.linalg.norm(lat_bf16) + 1e-12)
                )
                extra["int8_ddim50_latent_cos_vs_bf16"] = round(cos, 4)
                extra["int8_ddim50_latent_rel_err"] = round(rel, 4)
                # sample-level quality bound backing the int8 headline
                # (measured 2026-08: cos=1.0000, rel=0.0075)
                extra["int8_quality_ok"] = bool(cos > 0.99 and rel < 0.1)
        except Exception as e:
            record_err("int8_quality_error", e)

        # --- int8 attention core on top of static W8A8 (round 5): QKᵀ and
        # P·V run int8 with calibrated per-head scales, P·V at a per-row
        # probability scale. Interleaved A/B (scripts/bench_int8_ab.py):
        # 20.15 vs 22.09 ms/step (−8.8%); 'qk'-only LOSES (29.6) — the
        # mixed-dtype chain breaks XLA's fused attention emitter. Same
        # zeros-timing + shared-random-weights quality guard pattern.
        try:
            check_budget("int8_attn")
            iamodel = model.clone(
                quantized="static", int8_attention=True, unroll_blocks=False
            )
            iashapes = jax.eval_shape(
                lambda: iamodel.init(
                    {"params": rng}, jnp.zeros(x_shape, jnp.float32), t0c
                )
            )

            @jax.jit
            def init_ia():
                def mk(s):
                    if s.dtype == jnp.int8:
                        return jnp.zeros(s.shape, jnp.int8)
                    if s.dtype == jnp.float32:
                        return jnp.full(s.shape, 0.01, jnp.float32)
                    return jnp.zeros(s.shape, jnp.bfloat16)

                return jax.tree_util.tree_map(mk, iashapes)

            iaparams0 = init_ia()
            ia_scan = make_scan_sampler(iamodel)
            zia = jax.random.normal(jax.random.PRNGKey(5), x_shape, jnp.float32)
            np.asarray(ia_scan(iaparams0, zia)[0, 0, 0, 0, 0])  # compile
            t0 = time.perf_counter()
            for i in range(n_runs):
                zia = ia_scan(iaparams0, zia)
            via = np.asarray(zia[0, 0, 0, 0, 0])
            assert np.isfinite(via)
            extra["videos_per_min_int8_attn"] = round(
                BATCH * n_runs * 60.0 / (time.perf_counter() - t0), 3
            )

            # quality guard: the calib model with int8_attention also sows
            # per-head q/k/v amax; quantize_params folds them into the
            # {q,k,v}_scale leaves the static model consumes
            ciamodel = model.clone(
                quantized="calib", int8_attention=True, unroll_blocks=False
            )

            @jax.jit
            def calib_amax_ia(p, x, t_scalar):
                t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
                _, variables = ciamodel.apply(p, x, t, mutable=["calib"])
                return variables["calib"]

            amax_ia = None
            for tc in (999, 500, 0):
                amax_ia = merge_amax(amax_ia, calib_amax_ia(rparams, zc, jnp.int32(tc)))
            iaqparams = {
                "params": quantize_params(rparams["params"], act_amax=amax_ia)
            }
            lat_ia = np.asarray(ia_scan(iaqparams, zq0), np.float64)
            if np.isfinite(lat_ia).all() and np.isfinite(lat_bf16).all():
                cos = float(
                    (lat_ia * lat_bf16).sum()
                    / (np.linalg.norm(lat_ia) * np.linalg.norm(lat_bf16) + 1e-12)
                )
                rel = float(
                    np.linalg.norm(lat_ia - lat_bf16)
                    / (np.linalg.norm(lat_bf16) + 1e-12)
                )
                extra["int8_attn_latent_cos_vs_bf16"] = round(cos, 4)
                extra["int8_attn_latent_rel_err"] = round(rel, 4)
                extra["int8_attn_quality_ok"] = bool(cos > 0.99 and rel < 0.15)
        except Exception as e:
            record_err("int8_attn_error", e)

        # --- decode-inclusive throughput: SD AutoencoderKL decode of the 16
        # latent frames (weights random — conv cost is value-independent)
        try:
            check_budget("decode")
            from latte_tpu.vae.autoencoder_kl import AutoencoderKL

            vae = AutoencoderKL(dtype=jnp.bfloat16)
            zf = jnp.zeros((16, 4, 32, 32), jnp.float32)
            vshapes = jax.eval_shape(
                lambda: vae.init({"params": jax.random.PRNGKey(0)}, zf)
            )

            @jax.jit
            def vae_zeros():
                return jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, jnp.bfloat16), vshapes
                )

            vparams = vae_zeros()

            @jax.jit
            def decode(p, z):
                return vae.apply(p, z, method=vae.decode)

            np.asarray(decode(vparams, zf)[0, 0, 0, 0])  # compile
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(decode(vparams, zf)[0, 0, 0, 0])
            decode_s = (time.perf_counter() - t0) / 3
            sec_per_video = elapsed / (BATCH * n_runs)
            extra["vae_decode_s_per_video"] = round(decode_s, 3)
            extra["videos_per_min_with_decode"] = round(
                60.0 / (sec_per_video + decode_s), 3
            )
        except Exception as e:
            record_err("decode_error", e)

        # --- block-cache serving (core/block_cache.py): training-free
        # Δ-DiT/BlockDance-style acceleration — the front 9 of 14 pairs
        # recompute every 2nd DDIM step. Composes with static int8. The
        # fidelity number is measured on RANDOM weights (real checkpoints
        # are egress-blocked); feature similarity across timesteps is a
        # property of trained nets, so treat it as a mechanism guard, not
        # a final quality claim.
        try:
            check_budget("block_cache")
            from latte_tpu.core.block_cache import cached_sample_loop

            BC_K, BC_INT = 9, 2
            qmodel_scan = qmodel.clone(unroll_blocks=False)

            @jax.jit
            def bc_int8(p, z):
                return cached_sample_loop(
                    diffusion, qmodel_scan, p, z,
                    cache_pairs=BC_K, cache_interval=BC_INT,
                )

            zb = jax.random.normal(jax.random.PRNGKey(31), x_shape, jnp.float32)
            np.asarray(bc_int8(qparams, zb)[0, 0, 0, 0, 0])  # compile
            t0 = time.perf_counter()
            for _ in range(n_runs):
                zb = bc_int8(qparams, zb)
            vb = np.asarray(zb[0, 0, 0, 0, 0])
            assert np.isfinite(vb)
            extra["videos_per_min_int8_block_cache"] = round(
                BATCH * n_runs * 60.0 / (time.perf_counter() - t0), 3
            )

            try:
                # int8 attention composes with block-cache (both are
                # static-model clones; the cached scan jits over the same
                # param tree plus the per-head scale leaves)
                iam_scan = iamodel  # already unroll_blocks=False

                @jax.jit
                def bc_ia(p, z):
                    return cached_sample_loop(
                        diffusion, iam_scan, p, z,
                        cache_pairs=BC_K, cache_interval=BC_INT,
                    )

                zbi = jax.random.normal(
                    jax.random.PRNGKey(33), x_shape, jnp.float32
                )
                np.asarray(bc_ia(iaparams0, zbi)[0, 0, 0, 0, 0])  # compile
                t0 = time.perf_counter()
                for _ in range(n_runs):
                    zbi = bc_ia(iaparams0, zbi)
                vbi = np.asarray(zbi[0, 0, 0, 0, 0])
                assert np.isfinite(vbi)
                extra["videos_per_min_int8_attn_block_cache"] = round(
                    BATCH * n_runs * 60.0 / (time.perf_counter() - t0), 3
                )
            except Exception as e:
                extra["int8_attn_block_cache_error"] = repr(e)[:120]

            # fidelity: cached vs exact chain on shared random weights
            @jax.jit
            def bc_bf16(p, z):
                return cached_sample_loop(
                    diffusion, scan_model, p, z,
                    cache_pairs=BC_K, cache_interval=BC_INT,
                )

            lat_bc = np.asarray(bc_bf16(rparams, zq0), np.float64)
            if np.isfinite(lat_bc).all() and np.isfinite(lat_bf16).all():
                cos = float(
                    (lat_bc * lat_bf16).sum()
                    / (np.linalg.norm(lat_bc) * np.linalg.norm(lat_bf16) + 1e-12)
                )
                rel = float(
                    np.linalg.norm(lat_bc - lat_bf16)
                    / (np.linalg.norm(lat_bf16) + 1e-12)
                )
                extra["block_cache_latent_cos"] = round(cos, 4)
                extra["block_cache_latent_rel_err"] = round(rel, 4)
        except Exception as e:
            record_err("block_cache_error", e)

        # --- 128-frame long-video protocol (the fvd2048_128f shape,
        # `/root/reference/tools/metrics/metric_main.py:121-132`): one
        # DDIM-50 trajectory as a single on-device scan, bf16 and
        # static-int8. Attention dispatch measured at these exact shapes
        # (docs/tpu_notes.md round 4): XLA beats the flash kernel at both
        # the spatial (128,256,16,72) and temporal (256,128,16,72)
        # layouts, so "auto" routing is already optimal — the 128f levers
        # are the same static-int8 arithmetic as 16f serving PLUS the int8
        # attention core: at 128f BOTH attention layouts stay below
        # flash_min_n so the int8 QKᵀ/P·V dots apply everywhere, and
        # attention is ~16% of the step — measured 247.6 → 193.2 ms/step
        # (+28% videos/min; scripts/bench_128f_int8_attn.py, round 5).
        # Plain int8 (no attn) runs LAST as the cross-round continuity
        # number, dropped first when the soft budget is tight.
        try:
            check_budget("128f")
            x128_shape = (BATCH, 128, 4, 32, 32)
            for tag, m128, p128 in (
                ("videos_per_min_128f", model.clone(unroll_blocks=False, num_frames=128), None),
                (
                    "videos_per_min_128f_int8_attn",
                    model.clone(
                        unroll_blocks=False,
                        num_frames=128,
                        quantized="static",
                        int8_attention=True,
                    ),
                    None,
                ),
                (
                    "videos_per_min_128f_int8_attn_block_cache",
                    model.clone(
                        unroll_blocks=False,
                        num_frames=128,
                        quantized="static",
                        int8_attention=True,
                    ),
                    None,
                ),
                (
                    "videos_per_min_128f_int8",
                    model.clone(
                        unroll_blocks=False, num_frames=128, quantized="static"
                    ),
                    None,
                ),
            ):
                check_budget(tag)
                shapes128 = jax.eval_shape(
                    lambda m=m128: m.init(
                        {"params": rng},
                        jnp.zeros(x128_shape, jnp.float32),
                        t0c,
                    )
                )

                @jax.jit
                def init_128(shapes128=shapes128):
                    def mk(s):
                        if s.dtype == jnp.int8:
                            return jnp.zeros(s.shape, jnp.int8)
                        if s.dtype == jnp.float32:
                            return jnp.full(s.shape, 0.01, jnp.float32)
                        return jnp.zeros(s.shape, jnp.bfloat16)

                    return jax.tree_util.tree_map(mk, shapes128)

                p128 = init_128()
                if tag.endswith("block_cache"):
                    from latte_tpu.core.block_cache import cached_sample_loop

                    @jax.jit
                    def scan128(p, z, m=m128):
                        return cached_sample_loop(
                            diffusion, m, p, z, cache_pairs=9, cache_interval=2
                        )
                else:
                    scan128 = make_scan_sampler(m128)
                z128 = jax.random.normal(
                    jax.random.PRNGKey(21), x128_shape, jnp.float32
                )
                np.asarray(scan128(p128, z128)[0, 0, 0, 0, 0])  # compile
                t0 = time.perf_counter()
                z128 = scan128(p128, z128)
                v128 = np.asarray(z128[0, 0, 0, 0, 0])
                assert np.isfinite(v128)
                extra[tag] = round(
                    BATCH * 60.0 / (time.perf_counter() - t0), 3
                )
        except Exception as e:
            record_err("bench128f_error", e)

        # --- T2V 512² serving: the reference's flagship USER budget
        # (`/root/reference/configs/t2x/t2v_sample.yaml:19-28`: DDIM-50,
        # guidance 7.5, 16×512², temporal decode). Timed through the real
        # LattePipeline host loop (CFG batch-2 transformer at Latte-1
        # scale) with a fixed stand-in text embedding — T5 encode is a
        # one-off per prompt and is excluded, matching how producers cache
        # prompt embeddings. Where T2V diverges from the class-conditional
        # roofline: 4096-token spatial self-attention (flash-routed),
        # +cross-attention to 120 T5 tokens per block, adaLN-single
        # (shared table, per-block shift tables) — see docs/tpu_notes.md.
        try:
            check_budget("t2v_512")
            from latte_tpu.core.scheduler import get_scheduler
            from latte_tpu.models.t2v import LatteT2V
            from latte_tpu.sample.pipeline_t2v import LattePipeline

            class _FixedText:
                """Stand-in with the T5TextEncoder interface (fixed embeds)."""

                def encode_with_negative(self, prompts, negative_prompt="", clean=True):
                    b = len(prompts)
                    c = jnp.full((b, 120, 4096), 0.01, jnp.float32)
                    m = jnp.ones((b, 120), jnp.int32)
                    return c, m, jnp.zeros_like(c), m

            t2v_kw = dict(
                num_attention_heads=16, attention_head_dim=72, num_layers=28,
                caption_channels=4096, cross_attention_dim=1152,
                video_length=16, sample_size=64,  # 512² pixels / 8
                attention_mode="auto", unroll_blocks=False,
                dtype=jnp.bfloat16,
            )

            def t2v_zeros(m):
                sh = jax.eval_shape(
                    lambda: m.init(
                        {"params": rng},
                        jnp.zeros((2, 4, 16, 64, 64), jnp.float32),
                        jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 120, 4096), jnp.float32),
                        None,
                    )
                )

                @jax.jit
                def mk():
                    def f(s):
                        if s.dtype == jnp.int8:
                            return jnp.zeros(s.shape, jnp.int8)
                        if s.dtype == jnp.float32:
                            return jnp.full(s.shape, 0.01, jnp.float32)
                        return jnp.zeros(s.shape, jnp.bfloat16)

                    return jax.tree_util.tree_map(f, sh)

                return mk()

            for tag, t2v_quant, bc in (
                ("videos_per_min_t2v_512", False, 0),
                ("videos_per_min_t2v_512_int8", "static", 0),
                ("videos_per_min_t2v_512_int8_block_cache", "static", 2),
            ):
                tm = LatteT2V(quantized=t2v_quant, **t2v_kw)
                pipe = LattePipeline(
                    transformer=tm,
                    transformer_params=t2v_zeros(tm),
                    scheduler=get_scheduler("DDIM"),
                    text_encoder=_FixedText(),
                    block_cache_interval=bc,  # default k = 2/3 of 28 pairs
                )
                kw = dict(
                    video_length=16, height=512, width=512,
                    num_inference_steps=STEPS, guidance_scale=7.5,
                    output_type="latents", clean_caption=False,
                )
                out = pipe("bench prompt", seed=1, **kw)  # compile
                assert np.isfinite(out.video).all()
                t0 = time.perf_counter()
                out = pipe("bench prompt", seed=2, **kw)
                dt = time.perf_counter() - t0
                assert np.isfinite(np.asarray(out.video)[0, 0, 0, 0, 0])
                extra[tag] = round(60.0 / dt, 3)

            # chunk-14 SVD temporal decode of one 16×512² video (the
            # enable_vae_temporal_decoder=true path) — conv cost is
            # value-independent, random weights
            from latte_tpu.vae.temporal_decoder import TemporalDecoder

            tdec = TemporalDecoder(dtype=jnp.bfloat16)
            tdp = jax.jit(
                lambda: tdec.init(
                    {"params": rng}, jnp.zeros((1, 4, 64, 64)), num_frames=1
                )
            )()
            pipe_dec = LattePipeline(
                transformer=tm, transformer_params=None,
                scheduler=get_scheduler("DDIM"),
                temporal_decoder=tdec, temporal_decoder_params=tdp,
            )
            zlat = jax.random.normal(
                jax.random.PRNGKey(5), (1, 4, 16, 64, 64), jnp.float32
            )
            pipe_dec.decode_latents_with_temporal_decoder(zlat)  # compile
            t0 = time.perf_counter()
            vid = pipe_dec.decode_latents_with_temporal_decoder(zlat)
            dec_s = time.perf_counter() - t0
            assert np.isfinite(vid).all()
            extra["t2v_512_temporal_decode_s"] = round(dec_s, 3)
            for src, dst in (
                ("videos_per_min_t2v_512", "videos_per_min_t2v_512_with_decode"),
                (
                    "videos_per_min_t2v_512_int8_block_cache",
                    "videos_per_min_t2v_512_int8_bc_with_decode",
                ),
            ):
                base = extra.get(src)
                if base:
                    extra[dst] = round(60.0 / (60.0 / base + dec_s), 3)
        except Exception as e:
            record_err("bench_t2v_error", e)

    emit()


if __name__ == "__main__":
    main()
