"""persistence + gradfix shims + fixed_spatial tests."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from latte_tpu.persistence import is_persistent, persistent_class


@persistent_class
class Thing:
    """Module-level (persistence embeds the defining module's source)."""

    def __init__(self, a):
        self.a = a

    def double(self):
        return self.a * 2


class TestPersistence:
    def test_roundtrip_and_source_embedding(self):
        t = Thing(21)
        assert is_persistent(t)
        data = pickle.dumps(t)
        assert b"class Thing" in data  # source embedded
        back = pickle.loads(data)
        assert back.double() == 42


class TestGradfix:
    def test_conv2d_matches_torch(self, rng_np):
        import torch
        import torch.nn.functional as tF

        from latte_tpu.kernels.gradfix import conv2d

        x = rng_np.standard_normal((1, 3, 8, 8)).astype(np.float32)
        w = rng_np.standard_normal((5, 3, 3, 3)).astype(np.float32)
        ref = tF.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1)
        out = conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_conv_transpose_matches_torch(self, rng_np):
        import torch
        import torch.nn.functional as tF

        from latte_tpu.kernels.gradfix import conv2d

        x = rng_np.standard_normal((1, 3, 4, 4)).astype(np.float32)
        w = rng_np.standard_normal((3, 5, 3, 3)).astype(np.float32)  # IOHW
        ref = tF.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
        )
        out = conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1, transpose=True)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_no_weight_gradients(self, rng_np):
        from latte_tpu.kernels.gradfix import conv2d, no_weight_gradients

        x = jnp.asarray(rng_np.standard_normal((1, 2, 4, 4)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((2, 2, 3, 3)).astype(np.float32))

        def loss(w):
            with no_weight_gradients():
                return jnp.sum(conv2d(x, w, padding=1) ** 2)

        g = jax.grad(loss)(w)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_grid_sample_matches_torch(self, rng_np):
        import torch
        import torch.nn.functional as tF

        from latte_tpu.kernels.gradfix import grid_sample

        x = rng_np.standard_normal((2, 3, 5, 6)).astype(np.float32)
        grid = (rng_np.random((2, 4, 4, 2)).astype(np.float32) - 0.5) * 1.8
        ref = tF.grid_sample(
            torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )
        out = grid_sample(jnp.asarray(x), jnp.asarray(grid))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_second_order_grid_sample(self, rng_np):
        from latte_tpu.kernels.gradfix import grid_sample

        x = jnp.asarray(rng_np.standard_normal((1, 1, 4, 4)).astype(np.float32))
        grid = jnp.zeros((1, 2, 2, 2))

        f = lambda g: jnp.sum(grid_sample(x, g) ** 2)
        g2 = jax.hessian(lambda s: f(grid + s))(0.0)
        assert np.isfinite(float(g2))


class TestFixedSpatial:
    def test_only_temporal_attention_updates(self):
        from latte_tpu.core.diffusion import create_diffusion
        from latte_tpu.models import Latte
        from latte_tpu.train import create_train_state, make_train_step
        from latte_tpu.train.state import make_optimizer

        model = Latte(
            input_size=8, patch_size=2, hidden_size=32, depth=2, num_heads=2,
            num_frames=2, attention_mode="xla",
        )
        diffusion = create_diffusion("", diffusion_steps=50)
        optimizer = make_optimizer(lr=1e-2)
        x = jnp.zeros((1, 2, 4, 8, 8))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, jnp.zeros((1,), jnp.int32))
        # perturb away from adaLN-Zero init (whose gates zero out attention
        # grads); fine-tuning starts from pretrained weights in practice
        keys = iter(jax.random.split(jax.random.PRNGKey(9), 10_000))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.02 * jax.random.normal(next(keys), a.shape, a.dtype),
            variables["params"],
        )
        state = create_train_state(params, optimizer)
        step = jax.jit(
            make_train_step(model, diffusion, optimizer, fixed_spatial=True)
        )
        batch = {"latents": jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4, 8, 8))}
        new_state, _ = step(state, batch, jax.random.PRNGKey(2))

        flat_old = jax.tree_util.tree_leaves_with_path(state.params)
        flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
        for path, old in flat_old:
            keys = jax.tree_util.keystr(path)
            new = flat_new[path]
            changed = not np.allclose(np.asarray(old), np.asarray(new))
            if "temporal" in keys and "attn" in keys:
                assert changed, f"{keys} should have updated"
            else:
                assert not changed, f"{keys} should be frozen"
