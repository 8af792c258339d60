"""Training-step and multi-device sharding tests (8 virtual CPU devices)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from latte_tpu.core.diffusion import create_diffusion
from latte_tpu.dist.mesh import MeshConfig, make_mesh, replicate, shard_batch
from latte_tpu.models import Latte
from latte_tpu.train import create_train_state, make_train_step
from latte_tpu.train.state import make_lr_schedule, make_optimizer, update_ema


def tiny_setup(extras=1, num_classes=10):
    model = Latte(
        input_size=8,
        patch_size=2,
        hidden_size=32,
        depth=2,
        num_heads=2,
        num_frames=2,
        extras=extras,
        num_classes=num_classes,
        attention_mode="xla",
    )
    diffusion = create_diffusion("", diffusion_steps=50)
    optimizer = make_optimizer(lr=1e-3)
    x = jnp.zeros((2, 2, 4, 8, 8))
    rngs = {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)}
    kw = {"y": jnp.zeros((2,), jnp.int32)} if extras == 2 else {}
    variables = model.init(rngs, x, jnp.zeros((2,), jnp.int32), **kw)
    state = create_train_state(variables["params"], optimizer)
    return model, diffusion, optimizer, state


class TestTrainStep:
    def test_loss_decreases(self):
        model, diffusion, optimizer, state = tiny_setup()
        step = jax.jit(make_train_step(model, diffusion, optimizer))
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (4, 2, 4, 8, 8)) * 0.5
        }
        rng = jax.random.PRNGKey(3)
        losses = []
        for _ in range(30):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 30
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_ema_tracks_params(self):
        model, diffusion, optimizer, state = tiny_setup()
        step = jax.jit(make_train_step(model, diffusion, optimizer, ema_decay=0.5))
        batch = {"latents": jnp.ones((2, 2, 4, 8, 8)) * 0.1}
        s0_param = np.asarray(
            jax.tree_util.tree_leaves(state.params)[0]
        ).copy()
        for _ in range(3):
            state, _ = step(state, batch, jax.random.PRNGKey(0))
        p = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        e = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
        # ema lags params but has moved from init
        assert not np.allclose(e, p)
        assert not np.allclose(e, s0_param)

    def test_grad_clip_deferred(self):
        """Before start_clip_iter the step must not clip (scale==1)."""
        model, diffusion, optimizer, state = tiny_setup()
        batch = {"latents": jax.random.normal(jax.random.PRNGKey(2), (2, 2, 4, 8, 8))}
        step_noclip = jax.jit(
            make_train_step(
                model, diffusion, optimizer, clip_max_norm=1e-9, start_clip_iter=10**6
            )
        )
        step_clip = jax.jit(
            make_train_step(
                model, diffusion, optimizer, clip_max_norm=1e-9, start_clip_iter=0
            )
        )
        s1, _ = step_noclip(state, batch, jax.random.PRNGKey(0))
        s2, _ = step_clip(state, batch, jax.random.PRNGKey(0))
        p1 = jax.tree_util.tree_leaves(s1.params)
        p2 = jax.tree_util.tree_leaves(s2.params)
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(p1, p2)]
        assert max(diffs) > 0  # clipping changed the update

    def test_grad_accum_matches_manual_average(self):
        """grad_accum=2 must equal: average the two chunks' grads (computed
        with the step's documented rng derivation) and apply ONE update.
        SGD makes the expected update closed-form."""
        import optax

        model, diffusion, _, _ = tiny_setup()
        optimizer = optax.sgd(1e-2)
        x = jnp.zeros((2, 2, 4, 8, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, x, jnp.zeros((2,), jnp.int32)
        )
        state = create_train_state(variables["params"], optimizer)
        B = 4
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (B, 2, 4, 8, 8))
        }
        rng0 = jax.random.PRNGKey(7)
        step = make_train_step(
            model, diffusion, optimizer, grad_accum=2, start_clip_iter=10**6,
            ema_decay=0.5,
        )
        new_state, metrics = jax.jit(step)(state, batch, rng0)

        # manual: row r -> chunk r % 2; chunk k rng = fold_in(fold_in(rng0, step), k)
        rng = jax.random.fold_in(rng0, 0)
        grads, losses = [], []
        for k in (1, 2):
            rk = jax.random.fold_in(rng, k)
            rng_t, rng_noise, rng_drop, _ = jax.random.split(rk, 4)
            lat = batch["latents"][(k - 1) :: 2]
            t = jax.random.randint(rng_t, (2,), 0, diffusion.num_timesteps, dtype=jnp.int32)

            def loss_fn(params):
                terms = diffusion.training_losses(
                    lambda xx, tt, **kw: model.apply(
                        {"params": params}, xx, tt, train=True,
                        rngs={"label_dropout": rng_drop}, **kw,
                    ),
                    lat, t, model_kwargs={}, rng=rng_noise,
                )
                return jnp.mean(terms["loss"])

            l, g = jax.value_and_grad(loss_fn)(state.params)
            losses.append(float(l))
            grads.append(g)
        avg = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
        expected = jax.tree_util.tree_map(
            lambda p, g: p - 1e-2 * g, state.params, avg
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), np.mean(losses), rtol=1e-6
        )
        for (path, leaf), (_, exp) in zip(
            jax.tree_util.tree_leaves_with_path(new_state.params),
            jax.tree_util.tree_leaves_with_path(expected),
        ):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(exp), atol=1e-6,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_lr_schedule_warmup(self):
        sched = make_lr_schedule(1e-4, warmup_steps=100)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(50)), 5e-5, rtol=1e-6)
        np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-6)
        np.testing.assert_allclose(float(sched(10_000)), 1e-4, rtol=1e-6)

    def test_lr_schedule_cosine(self):
        # torch CosineAnnealingLR semantics (`/root/reference/models/__init__.py:21-28`):
        # lr_min + (lr-lr_min)*(1+cos(pi*t/T_max))/2, after linear warmup
        sched = make_lr_schedule(
            1e-4, warmup_steps=0, schedule="cosine", decay_steps=1000, lr_min=1e-6
        )
        np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
        mid = 1e-6 + (1e-4 - 1e-6) * 0.5
        np.testing.assert_allclose(float(sched(500)), mid, rtol=1e-5)
        np.testing.assert_allclose(float(sched(1000)), 1e-6, rtol=1e-4)
        # composed with warmup: cosine count starts after the boundary
        sched = make_lr_schedule(
            1e-4, warmup_steps=100, schedule="cosine", decay_steps=1000
        )
        np.testing.assert_allclose(float(sched(50)), 5e-5, rtol=1e-6)
        np.testing.assert_allclose(float(sched(100)), 1e-4, rtol=1e-6)
        np.testing.assert_allclose(float(sched(600)), 5e-5, rtol=1e-5)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            make_lr_schedule(1e-4, schedule="cosine", decay_steps=0)

    def test_update_ema_math(self):
        ema = {"w": jnp.ones((2,))}
        params = {"w": jnp.zeros((2,))}
        out = update_ema(ema, params, decay=0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


class TestOptimizerStateKnobs:
    """The two optimizer-bandwidth knobs from the round-5 training
    roofline (docs/tpu_notes.md): bf16 first-moment storage and
    every-K-steps EMA at decay^K."""

    def test_mu_bf16_moments_and_numerics(self):
        model, diffusion, _, _ = tiny_setup()
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (4, 2, 4, 8, 8)) * 0.5
        }
        rng = jax.random.PRNGKey(3)

        def run(mu_dtype):
            opt = make_optimizer(lr=1e-3, mu_dtype=mu_dtype)
            x = jnp.zeros((2, 2, 4, 8, 8))
            variables = model.init(
                {"params": jax.random.PRNGKey(0)}, x, jnp.zeros((2,), jnp.int32)
            )
            state = create_train_state(variables["params"], opt)
            step = jax.jit(make_train_step(model, diffusion, opt))
            for _ in range(5):
                state, metrics = step(state, batch, rng)
            return state, float(metrics["loss"])

        state_bf16, loss_bf16 = run(jnp.bfloat16)
        state_fp32, loss_fp32 = run(None)
        # mu stored bf16, nu stays fp32 (its 1e-3 increments are below
        # bf16 resolution — see make_optimizer docstring)
        adam_state = state_bf16.opt_state[0]
        mu_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(adam_state.mu)}
        nu_dtypes = {l.dtype for l in jax.tree_util.tree_leaves(adam_state.nu)}
        assert mu_dtypes == {jnp.dtype(jnp.bfloat16)}
        assert nu_dtypes == {jnp.dtype(jnp.float32)}
        assert np.isfinite(loss_bf16)
        # trajectory stays close to the fp32-moment run
        np.testing.assert_allclose(loss_bf16, loss_fp32, rtol=0.05)
        p_b = jax.tree_util.tree_leaves(state_bf16.params)[0]
        p_f = jax.tree_util.tree_leaves(state_fp32.params)[0]
        np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_f), atol=5e-4)

    def test_ema_every_semantics(self):
        model, diffusion, optimizer, state0 = tiny_setup()
        batch = {"latents": jnp.ones((2, 2, 4, 8, 8)) * 0.1}
        rng = jax.random.PRNGKey(0)
        step = jax.jit(
            make_train_step(model, diffusion, optimizer, ema_decay=0.5, ema_every=2)
        )
        e0 = np.asarray(jax.tree_util.tree_leaves(state0.ema_params)[0]).copy()
        state1, _ = step(state0, batch, rng)
        # step 1 of 2: EMA untouched
        e1 = np.asarray(jax.tree_util.tree_leaves(state1.ema_params)[0])
        np.testing.assert_array_equal(e1, e0)
        state2, _ = step(state1, batch, rng)
        # step 2: one refresh at decay^2 against the CURRENT params
        e2 = np.asarray(jax.tree_util.tree_leaves(state2.ema_params)[0])
        p2 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
        np.testing.assert_allclose(e2, 0.25 * e0 + 0.75 * p2, rtol=1e-5, atol=1e-7)

    def test_cli_plumbing(self, tmp_path):
        from latte_tpu.train.train import main
        from tests.test_train_loop import tiny_train_cfg

        out = main(
            tiny_train_cfg(
                tmp_path, adam_mu_dtype="bfloat16", ema_every=2,
                max_train_steps=4, ckpt_every=100,
            )
        )
        assert out["final_step"] == 4
        assert np.isfinite(out["loss"])


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(MeshConfig(dp=4, tp=2))
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("dp", "tp")

    def test_auto_dp(self):
        mesh = make_mesh(MeshConfig(dp=-1, tp=2))
        assert mesh.devices.shape == (4, 2)

    def test_pp_axis(self):
        mesh = make_mesh(MeshConfig(dp=2, tp=2, pp=2))
        assert mesh.devices.shape == (2, 2, 2)
        assert mesh.axis_names == ("dp", "tp", "pp")
        mesh = make_mesh(MeshConfig(dp=-1, pp=4))
        assert mesh.axis_names == ("dp", "tp", "pp")
        assert dict(mesh.shape) == {"dp": 2, "tp": 1, "pp": 4}

    def test_shard_batch_layout(self):
        mesh = make_mesh(MeshConfig(dp=8, tp=1))
        batch = {"latents": jnp.zeros((16, 2, 4, 8, 8))}
        sharded = shard_batch(mesh, batch)
        # each device holds 1/8 of the batch axis
        shard_shapes = {
            s.data.shape for s in sharded["latents"].addressable_shards
        }
        assert shard_shapes == {(2, 2, 4, 8, 8)}

    def test_replicate(self):
        mesh = make_mesh(MeshConfig(dp=8, tp=1))
        params = {"w": jnp.arange(8.0)}
        rep = replicate(mesh, params)
        assert rep["w"].sharding.is_fully_replicated


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_dryrun_multichip_4(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(4)

    def test_dryrun_multichip_self_provisions(self):
        """With only 8 visible devices, a 16-device dryrun must re-exec
        itself in a subprocess with a 16-virtual-device CPU platform
        (the driver's TPU-attached environment sees 1 device)."""
        import __graft_entry__

        assert len(jax.devices()) < 16
        __graft_entry__.dryrun_multichip(16)


class TestSequenceParallel:
    """activation_sharding=("dp","sp"): token-axis sharding with all-to-all
    at the spatial<->temporal relayouts — numerics must match unsharded."""

    def _build(self, activation_sharding=None):
        model = Latte(
            input_size=8,
            patch_size=2,
            hidden_size=32,
            depth=4,
            num_heads=2,
            num_frames=4,
            extras=1,
            attention_mode="xla",
            activation_sharding=activation_sharding,
        )
        x = jnp.zeros((2, 4, 4, 8, 8))
        t = jnp.zeros((2,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, t)
        return model, variables["params"]

    def test_sp_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        base_model, params = self._build(None)
        sp_model = base_model.clone(activation_sharding=("dp", "sp"))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8, 8))
        t = jnp.array([5, 40])
        expected = base_model.apply({"params": params}, x, t)

        mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
        assert mesh.axis_names == ("dp", "sp", "tp")
        params_s = jax.device_put(params, NamedSharding(mesh, P()))
        x_s = jax.device_put(x, NamedSharding(mesh, P("dp")))
        with mesh:
            fn = jax.jit(lambda p, xx, tt: sp_model.apply({"params": p}, xx, tt))
            out = fn(params_s, x_s, t)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5
        )

    def test_sp_with_tp_params(self):
        """SP composes with Megatron TP param sharding."""
        from latte_tpu.dist.sharding import shard_params

        base_model, params = self._build(None)
        sp_model = base_model.clone(activation_sharding=("dp", "sp"))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 8, 8))
        t = jnp.array([0, 17])
        expected = base_model.apply({"params": params}, x, t)

        mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2))
        params_s = shard_params(params, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_s = jax.device_put(x, NamedSharding(mesh, P("dp")))
        with mesh:
            fn = jax.jit(lambda p, xx, tt: sp_model.apply({"params": p}, xx, tt))
            out = fn(params_s, x_s, t)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5
        )


class TestFSDP:
    """fsdp_param_shardings: ZeRO-3 weight sharding over dp — one full
    train step must match the unsharded step bit-for-tolerance, with the
    block kernels actually dp-split on device."""

    def test_fsdp_step_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from latte_tpu.dist.sharding import fsdp_param_shardings, zero1_opt_shardings
        from latte_tpu.train.state import TrainState

        model, diffusion, optimizer, state = tiny_setup()
        train_step = make_train_step(model, diffusion, optimizer, extras=1)
        batch = {
            "latents": jax.random.normal(
                jax.random.PRNGKey(3), (8, 2, 4, 8, 8), jnp.float32
            )
        }
        rng = jax.random.PRNGKey(7)
        ref_state, ref_metrics = jax.jit(train_step)(state, batch, rng)
        ref_loss = float(ref_metrics["loss"])

        mesh = make_mesh(MeshConfig(dp=8))
        p_shard = fsdp_param_shardings(state.params, mesh)
        rep = NamedSharding(mesh, P())
        state_sh = TrainState(
            step=rep,
            params=p_shard,
            ema_params=p_shard,
            opt_state=zero1_opt_shardings(state.opt_state, mesh),
        )
        model2, _, _, state2 = tiny_setup()  # fresh (same seed) state
        with mesh:
            state2 = jax.tree_util.tree_map(jax.device_put, state2, state_sh)
            jitted = jax.jit(
                train_step,
                in_shardings=(state_sh, NamedSharding(mesh, P("dp")), None),
                out_shardings=(state_sh, None),
            )
            new_state, metrics = jitted(state2, batch, rng)
            loss = float(metrics["loss"])
        assert abs(loss - ref_loss) < 2e-5, (loss, ref_loss)

        # weights are genuinely dp-sharded on device (1/8 per chip)
        qkv = new_state.params["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
        assert not qkv.sharding.is_fully_replicated
        np.testing.assert_allclose(
            np.asarray(new_state.params["blocks"]["spatial"]["attn"]["qkv"]["kernel"]),
            np.asarray(ref_state.params["blocks"]["spatial"]["attn"]["qkv"]["kernel"]),
            rtol=2e-5,
            atol=2e-5,
        )

    def test_loss_aware_timestep_sampler_drives_the_step(self):
        """schedule_sampler: loss-second-moment — t flows from the host
        sampler through the dp-sharded batch, per-sample losses flow back,
        and the synced weights evolve deterministically (a replay with the
        same seeds reproduces them bit-for-bit, the single-controller
        equivalent of 'identical across processes')."""
        from latte_tpu.core.timestep_samplers import LossSecondMomentResampler

        def run_once():
            model, diffusion, optimizer, state = tiny_setup()
            sampler = LossSecondMomentResampler(diffusion, history_per_term=2)
            step = jax.jit(make_train_step(model, diffusion, optimizer, extras=1))
            mesh = make_mesh(MeshConfig(dp=8))
            with mesh:
                for k in range(8):
                    rng_t = jax.random.fold_in(jax.random.PRNGKey(99), k)
                    t, w = sampler.sample(rng_t, 8)
                    batch = shard_batch(
                        mesh,
                        {
                            "latents": np.asarray(
                                jax.random.normal(
                                    jax.random.fold_in(jax.random.PRNGKey(5), k),
                                    (8, 2, 4, 8, 8),
                                )
                            ),
                            "t": np.asarray(t),
                            "t_weights": np.asarray(w),
                        },
                    )
                    state, metrics = step(state, batch, jax.random.PRNGKey(0))
                    # the step consumed the provided t (and reported it back)
                    np.testing.assert_array_equal(
                        np.asarray(metrics["t_sampled"]), np.asarray(t)
                    )
                    # feedback path: global sharded arrays -> host history
                    sampler.update_with_local_losses(
                        metrics["t_sampled"], metrics["per_sample_loss"]
                    )
            return sampler.weights()

        w1 = run_once()
        w2 = run_once()
        np.testing.assert_array_equal(w1, w2)  # deterministic across replays
        # 8 steps x 8 samples over 50 timesteps with history_per_term=2:
        # warmup may not complete, but the history must be populated
        assert w1.shape == (50,)
        assert np.all(w1 > 0)

    def test_loss_second_moment_weights_go_nonuniform_after_warmup(self):
        from latte_tpu.core.diffusion import create_diffusion
        from latte_tpu.core.timestep_samplers import LossSecondMomentResampler

        diffusion = create_diffusion("", diffusion_steps=100)
        s = LossSecondMomentResampler(diffusion, history_per_term=2)
        # feed a loss profile increasing in t until fully warmed up
        ts = np.tile(np.arange(100), 2)
        s.update_with_all_losses(ts, 1.0 + ts.astype(np.float64))
        w = s.weights()
        assert not np.allclose(w, w[0])
        assert np.argmax(w) == 99  # highest loss -> highest weight
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)

    def test_zero3_hybrid_compiles_without_spmd_rematerialization(self, capfd):
        """The flagship dp x sp x tp + ZeRO-3 stack must compile clean.

        Round 2's passing dryrun carried two `spmd_partitioner.cc`
        "Involuntary full rematerialization" warnings on the
        adaLN_modulation dots inside the scanned while body — a per-block,
        per-step replicate-and-reslice on a real pod. GSPMD emits the
        warning on C++ stderr during compilation; capfd sees it.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from latte_tpu.dist.sharding import fsdp_opt_shardings, fsdp_param_shardings
        from latte_tpu.train.state import TrainState

        model, diffusion, optimizer, state = tiny_setup(extras=2)
        mesh = make_mesh(MeshConfig(dp=2, tp=2, sp=2))
        model = model.clone(activation_sharding=("dp", "sp"))
        train_step = make_train_step(model, diffusion, optimizer, extras=2)
        batch = {
            "latents": jnp.zeros((4, 2, 4, 8, 8), jnp.float32),
            "y": jnp.zeros((4,), jnp.int32),
        }
        with mesh:
            p_shard = fsdp_param_shardings(state.params, mesh)
            state_sh = TrainState(
                step=NamedSharding(mesh, P()),
                params=p_shard,
                ema_params=p_shard,
                opt_state=fsdp_opt_shardings(state.opt_state, mesh),
            )
            state = jax.tree_util.tree_map(jax.device_put, state, state_sh)
            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))), batch
            )
            jitted = jax.jit(
                train_step,
                in_shardings=(state_sh, NamedSharding(mesh, P("dp")), None),
            )
            compiled = jitted.lower(state, batch, jax.random.PRNGKey(0)).compile()
            # also run it: partitioned-but-wrong programs usually fail here
            _, metrics = jitted(state, batch, jax.random.PRNGKey(0))
            assert np.isfinite(float(metrics["loss"]))
        err = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in err, err[-3000:]

    def test_pp_step_compiles_without_spmd_rematerialization(self, capfd):
        """The dp x pp pipelined train step must also compile clean — the
        same GSPMD warning on the depth-sharded stack would mean the pair
        weights get replicated-and-resliced inside the shard_map body."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from latte_tpu.dist.pipeline import make_pipelined_apply
        from latte_tpu.dist.sharding import pp_param_shardings
        from latte_tpu.train.state import TrainState

        # depth=8 -> 4 scanned pairs, divisible by pp=4
        model = Latte(
            input_size=8, patch_size=2, hidden_size=32, depth=8,
            num_heads=2, num_frames=2, extras=2, num_classes=10,
            attention_mode="xla",
        )
        diffusion = create_diffusion("", diffusion_steps=50)
        optimizer = make_optimizer(lr=1e-3)
        x0 = jnp.zeros((2, 2, 4, 8, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "label_dropout": jax.random.PRNGKey(1)},
            x0, jnp.zeros((2,), jnp.int32), y=jnp.zeros((2,), jnp.int32),
        )
        state = create_train_state(variables["params"], optimizer)
        mesh = make_mesh(MeshConfig(dp=2, tp=1, pp=4))
        train_step = make_train_step(
            model, diffusion, optimizer, extras=2,
            apply_fn=make_pipelined_apply(model, mesh, microbatches=2),
        )
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (4, 2, 4, 8, 8)),
            "y": jnp.array([1, 2, 3, 4], jnp.int32),
        }
        with mesh:
            p_shard = pp_param_shardings(state.params, mesh)
            state_sh = TrainState(
                step=NamedSharding(mesh, P()),
                params=p_shard,
                ema_params=p_shard,
                opt_state=pp_param_shardings(state.opt_state, mesh, zero1=True),
            )
            state = jax.tree_util.tree_map(jax.device_put, state, state_sh)
            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P("dp"))), batch
            )
            jitted = jax.jit(
                train_step,
                in_shardings=(state_sh, NamedSharding(mesh, P("dp")), None),
                out_shardings=(state_sh, None),
            )
            jitted.lower(state, batch, jax.random.PRNGKey(0)).compile()
            _, metrics = jitted(state, batch, jax.random.PRNGKey(0))
            assert np.isfinite(float(metrics["loss"]))
        err = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in err, err[-3000:]
