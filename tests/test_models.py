"""Model-layer tests: shapes, init invariants, CFG semantics, IMG variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latte_tpu.models import Latte, LatteIMG, get_model
from latte_tpu.models.embeddings import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    timestep_embedding,
)


def small_model(**kw):
    defaults = dict(
        input_size=8,
        patch_size=2,
        hidden_size=64,
        depth=4,
        num_heads=4,
        num_frames=4,
        attention_mode="xla",
    )
    defaults.update(kw)
    return Latte(**defaults)


class TestEmbeddings:
    def test_sincos_2d_shape_and_layout(self):
        emb = get_2d_sincos_pos_embed(64, 4)
        assert emb.shape == (16, 64)
        # Reference layout (`models/latte.py:416-433`, verified against the
        # executed torch reference in test_reference_model_parity): the MAE
        # code's `emb_h` actually receives the WIDTH positions, so the first
        # half encodes width — same column across rows shares it...
        np.testing.assert_allclose(emb[1, :32], emb[5, :32])
        # ...and the second half encodes height — same grid-row shares it
        np.testing.assert_allclose(emb[0, 32:], emb[3, 32:])

    def test_sincos_1d(self):
        emb = get_1d_sincos_pos_embed(32, 7)
        assert emb.shape == (7, 32)
        # position 0 -> sin=0, cos=1
        np.testing.assert_allclose(emb[0, :16], 0.0, atol=1e-12)
        np.testing.assert_allclose(emb[0, 16:], 1.0, atol=1e-12)

    def test_timestep_embedding_glide_convention(self):
        t = jnp.array([0, 5])
        emb = timestep_embedding(t, 8)
        assert emb.shape == (2, 8)
        # t=0: cos part == 1, sin part == 0
        np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0)
        np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0)


class TestLatte:
    def _init(self, model, x, t, **kw):
        return model.init({"params": jax.random.PRNGKey(0)}, x, t, **kw)

    def test_forward_shape_learned_sigma(self):
        m = small_model()
        x = jnp.zeros((2, 4, 4, 8, 8))
        t = jnp.array([1, 9])
        params = self._init(m, x, t)
        out = m.apply(params, x, t)
        assert out.shape == (2, 4, 8, 8, 8)

    def test_zero_init_output(self):
        """adaLN-Zero + zero final layer -> exactly zero output at init."""
        m = small_model()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8, 8))
        t = jnp.array([3])
        params = self._init(m, x, t)
        out = m.apply(params, x, t)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_scanned_params_stacked(self):
        m = small_model(depth=6)
        x = jnp.zeros((1, 4, 4, 8, 8))
        params = self._init(m, x, jnp.array([0]))
        qkv = params["params"]["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
        assert qkv.shape == (3, 64, 192)  # (n_pairs, D, 3D)

    def test_class_conditional(self):
        m = small_model(extras=2, num_classes=10)
        x = jnp.zeros((2, 4, 4, 8, 8))
        t = jnp.array([1, 2])
        y = jnp.array([3, 7])
        params = m.init(
            {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
            x,
            t,
            y=y,
        )
        out = m.apply(params, x, t, y=y)
        assert out.shape == (2, 4, 8, 8, 8)
        # training path requires the dropout rng
        out2 = m.apply(
            params, x, t, y=y, train=True, rngs={"label_dropout": jax.random.PRNGKey(2)}
        )
        assert out2.shape == out.shape

    def test_text_embedding_path(self):
        m = small_model(extras=78)
        x = jnp.zeros((2, 4, 4, 8, 8))
        t = jnp.array([1, 2])
        txt = jnp.ones((2, 77, 768))
        params = self._init(m, x, t, text_embedding=txt)
        out = m.apply(params, x, t, text_embedding=txt)
        assert out.shape == (2, 4, 8, 8, 8)

    def test_cfg_halves_equal_and_scale(self):
        m = small_model(extras=2, num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 8, 8))
        t = jnp.array([5, 5, 5, 5])
        y = jnp.array([1, 2, 10, 10])
        params = m.init(
            {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
            x,
            t,
            y=y,
        )
        out = m.apply(params, x, t, y=y, cfg_scale=4.0, method=m.forward_with_cfg)
        assert out.shape == (4, 4, 8, 8, 8)
        eps = np.asarray(out[:, :, :4])
        np.testing.assert_array_equal(eps[:2], eps[2:])

    def test_registry(self):
        m = get_model("Latte-S/2", input_size=8, num_frames=4)
        assert m.hidden_size == 384 and m.depth == 12 and m.num_heads == 6
        with pytest.raises(ValueError):
            get_model("Latte-Q/3")

    def test_frame_count_flexibility(self):
        """Same params work for different frame counts (temp embed is computed)."""
        m = small_model()
        x4 = jnp.zeros((1, 4, 4, 8, 8))
        params = self._init(m, x4, jnp.array([0]))
        out = m.apply(params, jnp.zeros((1, 6, 4, 8, 8)), jnp.array([0]))
        assert out.shape == (1, 6, 8, 8, 8)


class TestLatteIMG:
    def test_joint_forward_train(self):
        m = LatteIMG(
            input_size=8,
            patch_size=2,
            hidden_size=64,
            depth=4,
            num_heads=4,
            num_frames=4,
            use_image_num=3,
            extras=2,
            num_classes=10,
            attention_mode="xla",
        )
        x = jnp.zeros((2, 7, 4, 8, 8))  # 4 video + 3 image frames
        t = jnp.array([1, 2])
        y = jnp.array([3, 7])
        y_image = jnp.array([[0, 1, 2], [3, 4, 5]])
        rngs = {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)}
        params = m.init(rngs, x, t, y=y, y_image=y_image, train=True)
        out = m.apply(
            params,
            x,
            t,
            y=y,
            y_image=y_image,
            train=True,
            rngs={"label_dropout": jax.random.PRNGKey(2)},
        )
        assert out.shape == (2, 7, 8, 8, 8)

    def test_eval_video_only(self):
        m = LatteIMG(
            input_size=8,
            patch_size=2,
            hidden_size=64,
            depth=4,
            num_heads=4,
            num_frames=4,
            use_image_num=3,
            attention_mode="xla",
        )
        x = jnp.zeros((1, 4, 4, 8, 8))
        params = m.init({"params": jax.random.PRNGKey(0)}, x, jnp.array([0]))
        out = m.apply(params, x, jnp.array([0]))
        assert out.shape == (1, 4, 8, 8, 8)


class TestFlashAttention:
    def test_matches_reference(self):
        from latte_tpu.kernels.attention import attention_reference, flash_attention

        key = jax.random.PRNGKey(0)
        q, k, v = (
            jax.random.normal(kk, (2, 256, 4, 64), dtype=jnp.float32)
            for kk in jax.random.split(key, 3)
        )
        ref = attention_reference(q, k, v)
        out = flash_attention(q, k, v, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_gradients_match(self):
        from latte_tpu.kernels.attention import attention_reference, flash_attention

        key = jax.random.PRNGKey(1)
        q, k, v = (
            jax.random.normal(kk, (1, 128, 2, 32), dtype=jnp.float32)
            for kk in jax.random.split(key, 3)
        )

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_pallas_backward_matches_xla_backward(self):
        """Own Pallas dq/dkv kernels vs XLA autodiff of the same math,
        with mixed block sizes and multi-row (batch*head) batching."""
        from latte_tpu.kernels.attention import flash_attention

        key = jax.random.PRNGKey(2)
        q, k, v = (
            jax.random.normal(kk, (2, 256, 4, 64), dtype=jnp.float32)
            for kk in jax.random.split(key, 3)
        )
        g = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 4, 64))

        def run(impl):
            def loss(q, k, v):
                out = flash_attention(
                    q, k, v, block_q=128, block_k=64, rows=4, bwd_impl=impl
                )
                return jnp.sum(out * g)

            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        gp = run("pallas")
        gx = run("xla")
        for a, b, name in zip(gp, gx, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
            )


class TestModelOptions:
    def test_gradient_checkpointing_grads(self):
        """remat'd blocks: identical loss/grads, trainable."""
        m_plain = small_model()
        m_remat = small_model(gradient_checkpointing=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8, 8))
        t = jnp.array([3])
        params = m_plain.init({"params": jax.random.PRNGKey(1)}, x, t)

        def loss(m, p):
            return jnp.sum(m.apply(p, x, t) ** 2)

        keys = iter(jax.random.split(jax.random.PRNGKey(2), 10_000))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, a.dtype), params
        )
        l1, g1 = jax.value_and_grad(lambda p: loss(m_plain, p))(params)
        l2, g2 = jax.value_and_grad(lambda p: loss(m_remat, p))(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_remat_policy_dots_grads(self):
        """remat_policy='dots' (save MXU outputs): same loss/grads as plain."""
        m_plain = small_model()
        m_dots = small_model(gradient_checkpointing=True, remat_policy="dots")
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8, 8))
        t = jnp.array([3])
        params = m_plain.init({"params": jax.random.PRNGKey(1)}, x, t)

        def loss(m, p):
            return jnp.sum(m.apply(p, x, t) ** 2)

        l1, g1 = jax.value_and_grad(lambda p: loss(m_plain, p))(params)
        l2, g2 = jax.value_and_grad(lambda p: loss(m_dots, p))(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_unroll_blocks_matches_scan(self):
        m_scan = small_model()
        m_unroll = small_model(unroll_blocks=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8, 8))
        t = jnp.array([3])
        params = m_scan.init({"params": jax.random.PRNGKey(1)}, x, t)
        keys = iter(jax.random.split(jax.random.PRNGKey(2), 10_000))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, a.dtype), params
        )
        o1 = m_scan.apply(params, x, t)
        o2 = m_unroll.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)

    def test_bf16_compute(self):
        m = small_model(dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8, 8))
        t = jnp.array([3])
        params = m.init({"params": jax.random.PRNGKey(1)}, x, t)
        out = m.apply(params, x, t)
        assert out.dtype == jnp.float32  # cast back to input dtype
        assert np.isfinite(np.asarray(out)).all()


class TestLatteIMGText:
    def test_joint_text_conditioning(self):
        m = LatteIMG(
            input_size=8, patch_size=2, hidden_size=64, depth=4, num_heads=4,
            num_frames=4, use_image_num=2, extras=78, attention_mode="xla",
        )
        x = jnp.zeros((2, 6, 4, 8, 8))  # 4 video + 2 images
        t = jnp.array([1, 2])
        txt = jnp.ones((2, 3, 32))  # 1 video row + 2 image rows
        params = m.init(
            {"params": jax.random.PRNGKey(0)}, x, t, text_embedding=txt, train=True
        )
        out = m.apply(params, x, t, text_embedding=txt, train=True)
        assert out.shape == (2, 6, 8, 8, 8)
        assert np.isfinite(np.asarray(out)).all()
