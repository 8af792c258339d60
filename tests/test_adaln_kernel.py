"""Fused adaLN glue kernels (kernels/adaln.py): forward parity against the
pure-jnp math the unfused block compiles, and custom-VJP gradients against
jax.grad of that same reference — so the kernel is safe in the training
step, not just serving. Runs in Pallas interpret mode on the CPU test
platform; the same code lowers natively on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latte_tpu.kernels.adaln import (
    ln_modulate,
    ln_modulate_reference,
    residual_ln_modulate,
    residual_ln_modulate_reference,
)

SHAPES = [(4, 32, 256), (6, 8, 384)]  # (rows, tokens, D); D % 128 == 0


def _inputs(B, N, D, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return (
        jax.random.normal(ks[0], (B, N, D), dtype),
        jax.random.normal(ks[1], (B, N, D), dtype),
        jax.random.normal(ks[2], (B, D), dtype),
        jax.random.normal(ks[3], (B, D), dtype),
        jax.random.normal(ks[4], (B, D), dtype),
    )


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_modulate_forward(shape, dtype):
    B, N, D = shape
    x, _, _, shift, scale = _inputs(B, N, D, dtype)
    got = ln_modulate(x, shift, scale)
    want = ln_modulate_reference(x, shift, scale)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_residual_ln_modulate_forward(shape, dtype):
    B, N, D = shape
    x, delta, gate, shift, scale = _inputs(B, N, D, dtype)
    y, out = residual_ln_modulate(x, delta, gate, shift, scale)
    y_ref, out_ref = residual_ln_modulate_reference(x, delta, gate, shift, scale)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=tol, rtol=tol
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out_ref, np.float32), atol=tol, rtol=tol
    )


def test_ln_modulate_grad_matches_autodiff():
    B, N, D = 3, 16, 256
    x, _, _, shift, scale = _inputs(B, N, D, jnp.float32, seed=1)

    def loss_k(x, shift, scale):
        out = ln_modulate(x, shift, scale)
        return jnp.sum(jnp.sin(out))

    def loss_r(x, shift, scale):
        out = ln_modulate_reference(x, shift, scale)
        return jnp.sum(jnp.sin(out))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, shift, scale)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, shift, scale)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_residual_ln_modulate_grad_matches_autodiff():
    B, N, D = 3, 16, 256
    x, delta, gate, shift, scale = _inputs(B, N, D, jnp.float32, seed=2)

    def loss_k(*args):
        y, out = residual_ln_modulate(*args)
        # exercise BOTH cotangents: the residual carry and the matmul input
        return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(y))

    def loss_r(*args):
        y, out = residual_ln_modulate_reference(*args)
        return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(y))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, delta, gate, shift, scale)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, delta, gate, shift, scale)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_matches_flax_layernorm_semantics():
    """The fused op must reproduce nn.LayerNorm(use_bias/scale=False,
    eps=1e-6) + modulate exactly (the AdaLNBlock math it replaces)."""
    import flax.linen as nn

    B, N, D = 2, 8, 128
    x, _, _, shift, scale = _inputs(B, N, D, jnp.float32, seed=3)
    ln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False)
    normed = ln.apply({}, x)
    want = normed * (1.0 + scale[:, None, :]) + shift[:, None, :]
    got = ln_modulate(x, shift, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)
