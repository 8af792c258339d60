"""Diffusion-engine unit tests: fp64 self-oracles + exact parity with the
reference engine (imported as an oracle when mounted; never copied)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latte_tpu.core import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)
from latte_tpu.core.samplers import cfg_model_fn, ddim_sample_loop, p_sample_loop

from conftest import REFERENCE, requires_reference


def dummy_model(x, t, scale=0.1):
    """Deterministic stand-in model: eps-and-var output (B,F,2C,H,W)."""
    b = x.shape[0]
    tt = t.reshape((b,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    mean = scale * x * jnp.cos(tt / 7.0)
    var = jnp.tanh(x + tt / 100.0)
    return jnp.concatenate([mean, var], axis=2)


class TestSchedules:
    def test_linear_schedule_values(self):
        betas = get_named_beta_schedule("linear", 1000)
        assert betas.dtype == np.float64
        np.testing.assert_allclose(betas[0], 1e-4)
        np.testing.assert_allclose(betas[-1], 0.02)
        assert np.all(np.diff(betas) > 0)

    def test_cosine_schedule_capped(self):
        betas = get_named_beta_schedule("squaredcos_cap_v2", 1000)
        assert betas.max() <= 0.999
        assert betas.min() > 0

    def test_space_timesteps_ddim(self):
        s = space_timesteps(1000, "ddim50")
        assert s == set(range(0, 1000, 20))

    def test_space_timesteps_sections(self):
        s = space_timesteps(300, [10, 15, 20])
        assert len(s) == 45

    def test_derived_tables_fp64_oracle(self):
        betas = get_named_beta_schedule("linear", 100)
        d = GaussianDiffusion(betas=betas)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        np.testing.assert_allclose(d.alphas_cumprod, ac, rtol=1e-14)
        np.testing.assert_allclose(
            d.posterior_variance,
            betas * (1 - np.append(1.0, ac[:-1])) / (1 - ac),
            rtol=1e-12,
        )
        # log-var clipped at t=0 equals t=1 entry
        assert d.posterior_log_variance_clipped[0] == d.posterior_log_variance_clipped[1]


class TestEngineMath:
    def setup_method(self):
        self.d = create_diffusion("", diffusion_steps=100)
        key = jax.random.PRNGKey(0)
        self.x0 = jax.random.normal(key, (2, 4, 4, 8, 8))
        self.t = jnp.array([3, 77], dtype=jnp.int32)
        self.noise = jax.random.normal(jax.random.PRNGKey(1), self.x0.shape)

    def test_q_sample_roundtrip(self):
        """predict_xstart(eps) inverts q_sample exactly."""
        xt = self.d.q_sample(self.x0, self.t, self.noise)
        x0_hat = self.d._predict_xstart_from_eps(xt, self.t, self.noise)
        np.testing.assert_allclose(x0_hat, self.x0, rtol=1e-4, atol=1e-4)

    def test_eps_xstart_inverse(self):
        xt = self.d.q_sample(self.x0, self.t, self.noise)
        eps_hat = self.d._predict_eps_from_xstart(xt, self.t, self.x0)
        np.testing.assert_allclose(eps_hat, self.noise, rtol=1e-3, atol=1e-4)

    def test_p_mean_variance_shapes(self):
        xt = self.d.q_sample(self.x0, self.t, self.noise)
        out = self.d.p_mean_variance(dummy_model, xt, self.t)
        for k in ("mean", "variance", "log_variance", "pred_xstart"):
            assert out[k].shape == self.x0.shape

    def test_training_losses_shapes_and_finite(self):
        terms = jax.jit(
            lambda x0, t, n: self.d.training_losses(dummy_model, x0, t, noise=n)
        )(self.x0, self.t, self.noise)
        assert terms["loss"].shape == (2,)
        assert terms["mse"].shape == (2,)
        assert terms["vb"].shape == (2,)
        assert np.isfinite(np.asarray(terms["loss"])).all()

    def test_vb_gradient_does_not_touch_mean(self):
        """The VB term must only train the variance head (stop-gradient on mean)."""

        def loss_scale(s):
            def model(x, t):
                return dummy_model(x, t, scale=s)

            return self.d.training_losses(model, self.x0, self.t, noise=self.noise)

        g = jax.grad(lambda s: loss_scale(s)["vb"].sum())(0.1)
        # dummy var head doesn't depend on scale; mean is stop-gradient'ed
        assert abs(float(g)) < 1e-12

    def test_ddim_deterministic(self):
        d = create_diffusion("ddim10", diffusion_steps=100)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 8, 8))
        s1 = ddim_sample_loop(d, dummy_model, x)
        s2 = ddim_sample_loop(d, dummy_model, x)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        assert np.isfinite(np.asarray(s1)).all()

    def test_p_sample_loop_runs_jitted(self):
        d = create_diffusion("10", diffusion_steps=100)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 8, 8))
        out = jax.jit(lambda z, k: p_sample_loop(d, dummy_model, z, rng=k))(
            x, jax.random.PRNGKey(3)
        )
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_cfg_model_fn_halves_identical(self):
        fn = cfg_model_fn(dummy_model, cfg_scale=4.0)
        x = jnp.concatenate([self.x0, self.x0], axis=0)
        t = jnp.concatenate([self.t, self.t], axis=0)
        out = fn(x, t)
        eps = out[:, :, :4]
        np.testing.assert_array_equal(np.asarray(eps[:2]), np.asarray(eps[2:]))

    def test_bpd_loop(self):
        d = create_diffusion("5", diffusion_steps=50)
        out = d.calc_bpd_loop(dummy_model, self.x0, jax.random.PRNGKey(0))
        assert out["total_bpd"].shape == (2,)
        assert out["vb"].shape == (2, 5)
        assert np.isfinite(np.asarray(out["total_bpd"])).all()


@requires_reference
class TestReferenceParity:
    """Exact numerical parity with the reference engine (torch CPU oracle)."""

    @classmethod
    def setup_class(cls):
        sys.path.insert(0, REFERENCE)
        import diffusion as ref_diffusion  # noqa

        cls.ref_diffusion = ref_diffusion

    @classmethod
    def teardown_class(cls):
        sys.path.remove(REFERENCE)

    @pytest.mark.parametrize("respacing", ["", "ddim50", "250", "36,36,28"])
    def test_beta_tables_match(self, respacing):
        ref = self.ref_diffusion.create_diffusion(respacing)
        ours = create_diffusion(respacing)
        np.testing.assert_allclose(ours.betas, np.asarray(ref.betas), rtol=1e-12)
        if ours.timestep_map is not None:
            np.testing.assert_array_equal(ours.timestep_map, np.array(ref.timestep_map))
        np.testing.assert_allclose(
            ours.posterior_log_variance_clipped,
            ref.posterior_log_variance_clipped,
            rtol=1e-12,
        )

    def _torch_dummy(self):
        import torch

        def model(x, t, **kw):
            tt = t.reshape((x.shape[0],) + (1,) * (x.dim() - 1)).float()
            mean = 0.1 * x * torch.cos(tt / 7.0)
            var = torch.tanh(x + tt / 100.0)
            return torch.cat([mean, var], dim=2)

        return model

    def test_training_losses_match(self):
        import torch

        ref = self.ref_diffusion.create_diffusion("")
        ours = create_diffusion("")
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((2, 4, 4, 8, 8)).astype(np.float32)
        noise = rng.standard_normal(x0.shape).astype(np.float32)
        t = np.array([5, 700])

        ref_terms = ref.training_losses(
            self._torch_dummy(),
            torch.from_numpy(x0),
            torch.from_numpy(t),
            noise=torch.from_numpy(noise),
        )
        our_terms = ours.training_losses(
            dummy_model, jnp.asarray(x0), jnp.asarray(t), noise=jnp.asarray(noise)
        )
        for k in ("loss", "mse", "vb"):
            np.testing.assert_allclose(
                np.asarray(our_terms[k]),
                ref_terms[k].numpy(),
                rtol=2e-4,
                atol=1e-5,
                err_msg=k,
            )

    @pytest.mark.parametrize("respacing", ["ddim10", "10"])
    def test_sampling_loop_matches(self, respacing):
        """Full denoising trajectories match with shared recorded noise."""
        import torch

        ref = self.ref_diffusion.create_diffusion(respacing)
        ours = create_diffusion(respacing)
        rng = np.random.default_rng(1)
        xT = rng.standard_normal((1, 2, 4, 8, 8)).astype(np.float32)
        T = ours.num_timesteps
        noise_sched = rng.standard_normal((T,) + xT.shape).astype(np.float32)

        # reference loop (torch)
        x = torch.from_numpy(xT.copy())
        tm = self._torch_dummy()
        for i in reversed(range(T)):
            t = torch.tensor([i])
            if respacing.startswith("ddim"):
                out = ref.ddim_sample(ref._wrap_model(tm), x, t)
                # deterministic: no noise injected (eta=0)
                x = out["sample"]
            else:
                out = ref.p_mean_variance(tm, x, t)
                nz = float(i != 0)
                x = out["mean"] + nz * torch.exp(
                    0.5 * out["log_variance"]
                ) * torch.from_numpy(noise_sched[i])
        ref_final = x.numpy()

        if respacing.startswith("ddim"):
            our_final = ddim_sample_loop(ours, dummy_model, jnp.asarray(xT))
        else:
            our_final = p_sample_loop(
                ours, dummy_model, jnp.asarray(xT), noise_schedule=jnp.asarray(noise_sched)
            )
        np.testing.assert_allclose(np.asarray(our_final), ref_final, rtol=1e-3, atol=1e-4)


class TestHostStepCache:
    """Host-loop jitted steps must be cached across sample-loop calls
    (repeated `sample_many` iterations must not re-trace per call)."""

    def _model_apply(self, p, x, t, **kw):
        tt = t.reshape((x.shape[0],) + (1,) * (x.ndim - 1)).astype(jnp.float32)
        mean = p["w"] * x * jnp.cos(tt / 7.0)
        var = jnp.tanh(x + tt / 100.0)
        return jnp.concatenate([mean, var], axis=2)

    def test_cache_reuse_and_scan_equivalence(self):
        from latte_tpu.core import samplers

        d = create_diffusion("ddim5", diffusion_steps=50)
        params = {"w": jnp.float32(0.1)}
        xT = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 8, 8))

        samplers._HOST_STEP_CACHE.clear()
        a = ddim_sample_loop(
            d, None, xT, loop="host", params=params, model_apply=self._model_apply
        )
        assert len(samplers._HOST_STEP_CACHE) == 1
        b = ddim_sample_loop(
            d, None, xT, loop="host", params=params, model_apply=self._model_apply
        )
        assert len(samplers._HOST_STEP_CACHE) == 1, "second call must hit the cache"
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        scan = ddim_sample_loop(
            d, lambda x, t, **kw: self._model_apply(params, x, t, **kw), xT
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(scan), rtol=1e-5, atol=1e-6)

    def test_model_kwargs_are_arguments_not_constants(self):
        """Different kwarg VALUES must reuse the same traced step."""
        from latte_tpu.core import samplers

        d = create_diffusion("ddim5", diffusion_steps=50)
        params = {"w": jnp.float32(0.1)}

        def apply_with_y(p, x, t, y=None, **kw):
            return self._model_apply(p, x, t) + 0.001 * y.astype(jnp.float32).reshape(
                -1, *([1] * (x.ndim - 1))
            )

        xT = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 8, 8))
        samplers._HOST_STEP_CACHE.clear()
        a = ddim_sample_loop(
            d, None, xT, loop="host", params=params, model_apply=apply_with_y,
            model_kwargs={"y": jnp.array([0, 1])},
        )
        b = ddim_sample_loop(
            d, None, xT, loop="host", params=params, model_apply=apply_with_y,
            model_kwargs={"y": jnp.array([5, 9])},
        )
        assert len(samplers._HOST_STEP_CACHE) == 1
        jitted = next(iter(samplers._HOST_STEP_CACHE.values()))[0]
        assert jitted._cache_size() == 1, "kwarg values must not force retrace"
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_rng_mode_stochastic_step_cached(self):
        from latte_tpu.core import samplers

        d = create_diffusion("5", diffusion_steps=50)
        params = {"w": jnp.float32(0.1)}
        xT = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 8, 8))
        samplers._HOST_STEP_CACHE.clear()
        a = p_sample_loop(
            d, None, xT, rng=jax.random.PRNGKey(3), loop="host",
            params=params, model_apply=self._model_apply,
        )
        b = p_sample_loop(
            d, None, xT, rng=jax.random.PRNGKey(4), loop="host",
            params=params, model_apply=self._model_apply,
        )
        assert len(samplers._HOST_STEP_CACHE) == 1
        assert not np.allclose(np.asarray(a), np.asarray(b))
