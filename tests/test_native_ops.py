"""bias_act / upfirdn2d: XLA impl vs native C++ library (mutual oracles)
and analytic cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latte_tpu.kernels.bias_act import activation_funcs, bias_act
from latte_tpu.kernels.upfirdn import (
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)
from latte_tpu.native import (
    bias_act_native,
    native_available,
    upfirdn2d_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


class TestBiasActXLA:
    def test_linear_with_bias(self, rng_np):
        x = rng_np.standard_normal((2, 3, 4, 4)).astype(np.float32)
        b = np.array([1.0, -1.0, 0.5], np.float32)
        y = bias_act(jnp.asarray(x), jnp.asarray(b), act="linear")
        np.testing.assert_allclose(np.asarray(y), x + b[None, :, None, None], rtol=1e-6)

    def test_lrelu_default_gain(self):
        x = jnp.asarray([-1.0, 2.0])
        y = bias_act(x, dim=0, act="lrelu")
        np.testing.assert_allclose(
            np.asarray(y), np.array([-0.2, 2.0]) * np.sqrt(2), rtol=1e-6
        )

    def test_clamp(self):
        y = bias_act(jnp.asarray([-5.0, 5.0]), dim=0, act="linear", clamp=1.0)
        np.testing.assert_array_equal(np.asarray(y), [-1.0, 1.0])

    def test_second_order_grad_exists(self):
        f = lambda x: bias_act(x, act="swish", dim=0).sum()
        g2 = jax.grad(jax.grad(f))(jnp.asarray(0.7))
        assert np.isfinite(float(g2))


class TestUpfirdnXLA:
    def test_identity(self, rng_np):
        x = rng_np.standard_normal((1, 2, 5, 5)).astype(np.float32)
        y = upfirdn2d(jnp.asarray(x), jnp.ones((1, 1)))
        np.testing.assert_allclose(np.asarray(y), x, rtol=1e-6)

    def test_box_downsample(self):
        x = jnp.ones((1, 1, 4, 4))
        f = setup_filter([1.0, 1.0])
        y = downsample2d(x, f)
        assert y.shape == (1, 1, 2, 2)
        np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)

    def test_upsample_preserves_mean(self):
        x = jnp.ones((1, 1, 4, 4))
        f = setup_filter([1.0, 3.0, 3.0, 1.0])
        y = upsample2d(x, f)
        assert y.shape == (1, 1, 8, 8)
        np.testing.assert_allclose(float(jnp.mean(y[:, :, 2:-2, 2:-2])), 1.0, rtol=1e-4)

    def test_filter2d_keeps_shape(self, rng_np):
        x = rng_np.standard_normal((1, 3, 6, 6)).astype(np.float32)
        f = setup_filter([1.0, 2.0, 1.0])
        y = filter2d(jnp.asarray(x), f)
        assert y.shape == x.shape


@needs_native
class TestNativeParity:
    @pytest.mark.parametrize("act", sorted(activation_funcs))
    def test_bias_act_matches_xla(self, act, rng_np):
        x = rng_np.standard_normal((2, 4, 3, 3)).astype(np.float32)
        b = rng_np.standard_normal((4,)).astype(np.float32)
        y_native = bias_act_native(x, b, act=act, gain=1.3, clamp=0.9, alpha=0.2)
        y_xla = bias_act(
            jnp.asarray(x), jnp.asarray(b), act=act, gain=1.3, clamp=0.9, alpha=0.2
        )
        np.testing.assert_allclose(y_native, np.asarray(y_xla), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize(
        "up,down,pad",
        [((1, 1), (1, 1), (1, 1, 1, 1)), ((2, 2), (1, 1), (2, 1, 2, 1)),
         ((1, 1), (2, 2), (1, 1, 1, 1)), ((2, 1), (1, 2), (1, 2, 0, 3))],
    )
    def test_upfirdn_matches_xla(self, up, down, pad, rng_np):
        x = rng_np.standard_normal((2, 3, 6, 5)).astype(np.float32)
        f = rng_np.standard_normal((3, 4)).astype(np.float32)
        y_native = upfirdn2d_native(x, f, up=up, down=down, pad=pad, gain=1.5)
        y_xla = upfirdn2d(
            jnp.asarray(x), jnp.asarray(f), up=(up[0], up[1]), down=(down[0], down[1]),
            padding=pad, gain=1.5,
        )
        np.testing.assert_allclose(y_native, np.asarray(y_xla), rtol=1e-4, atol=1e-5)


class TestConv2dResample:
    def test_identity_filter(self, rng_np):
        from latte_tpu.kernels.conv2d_resample import conv2d_resample

        x = jnp.asarray(rng_np.standard_normal((1, 2, 8, 8)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((3, 2, 1, 1)).astype(np.float32))
        out = conv2d_resample(x, w)
        assert out.shape == (1, 3, 8, 8)

    def test_up_down_shapes(self, rng_np):
        from latte_tpu.kernels.conv2d_resample import conv2d_resample
        from latte_tpu.kernels.upfirdn import setup_filter

        x = jnp.asarray(rng_np.standard_normal((1, 2, 8, 8)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((2, 2, 3, 3)).astype(np.float32))
        f = setup_filter([1.0, 2.0, 1.0])
        up = conv2d_resample(x, w, f=f, up=2, padding=1)
        assert up.shape == (1, 2, 16, 16)
        down = conv2d_resample(x, w, f=f, down=2, padding=1)
        assert down.shape == (1, 2, 4, 4)
