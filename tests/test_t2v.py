"""LatteT2V model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.models.t2v import LatteT2V


def tiny_t2v(**kw):
    cfg = dict(
        num_attention_heads=2,
        attention_head_dim=16,
        num_layers=2,
        patch_size=2,
        sample_size=8,
        cross_attention_dim=32,
        caption_channels=64,
        video_length=4,
        attention_mode="xla",
    )
    cfg.update(kw)
    return LatteT2V(**cfg)


class TestLatteT2V:
    def _init(self, m, *args, **kw):
        return m.init({"params": jax.random.PRNGKey(0)}, *args, **kw)

    def test_forward_shapes(self):
        m = tiny_t2v()
        x = jnp.zeros((2, 4, 4, 16, 16))  # (B, C, F, H, W)
        t = jnp.array([3, 500])
        ctx = jnp.ones((2, 10, 64))
        mask = jnp.ones((2, 10), jnp.int32)
        v = self._init(m, x, t, ctx, mask)
        out = m.apply(v, x, t, ctx, mask)
        assert out.shape == (2, 8, 4, 16, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_mask_changes_output(self):
        m = tiny_t2v()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 16, 16))
        t = jnp.array([10])
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 64))
        v = self._init(m, x, t, ctx, jnp.ones((1, 10), jnp.int32))
        full = m.apply(v, x, t, ctx, jnp.ones((1, 10), jnp.int32))
        half_mask = jnp.concatenate(
            [jnp.ones((1, 5), jnp.int32), jnp.zeros((1, 5), jnp.int32)], axis=1
        )
        masked = m.apply(v, x, t, ctx, half_mask)
        assert not np.allclose(np.asarray(full), np.asarray(masked))

    def test_masked_tokens_ignored(self):
        """Masked-out caption tokens must not affect the output at all."""
        m = tiny_t2v()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 16, 16))
        t = jnp.array([10])
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 64))
        mask = jnp.concatenate(
            [jnp.ones((1, 5), jnp.int32), jnp.zeros((1, 5), jnp.int32)], axis=1
        )
        v = self._init(m, x, t, ctx, mask)
        out1 = m.apply(v, x, t, ctx, mask)
        ctx2 = ctx.at[:, 5:].set(123.0)  # perturb only masked tokens
        out2 = m.apply(v, x, t, ctx2, mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_temporal_attentions_disabled(self):
        m = tiny_t2v(enable_temporal_attentions=False)
        x = jnp.zeros((1, 4, 1, 16, 16))  # t2i: single frame
        t = jnp.array([0])
        ctx = jnp.ones((1, 10, 64))
        v = self._init(m, x, t, ctx, None)
        # no temporal params created
        flat = jax.tree_util.tree_leaves_with_path(v["params"])
        assert not any("temporal" in jax.tree_util.keystr(p) for p, _ in flat)
        out = m.apply(v, x, t, ctx, None)
        assert out.shape == (1, 8, 1, 16, 16)

    def test_joint_image_training(self):
        m = tiny_t2v()
        use_image_num = 2
        x = jnp.zeros((1, 4, 6, 16, 16))  # 4 video + 2 images
        t = jnp.array([7])
        ctx = jnp.ones((1, 1 + use_image_num, 10, 64))  # per-frame captions
        mask = jnp.ones((1, 1 + use_image_num, 10), jnp.int32)
        v = self._init(m, x, t, ctx, mask, use_image_num=use_image_num, train=True)
        out = m.apply(v, x, t, ctx, mask, use_image_num=use_image_num, train=True)
        assert out.shape == (1, 8, 6, 16, 16)

    def test_video_length_flexibility(self):
        """Params trained at video_length 4 run at other frame counts."""
        m = tiny_t2v()
        x4 = jnp.zeros((1, 4, 4, 16, 16))
        t = jnp.array([0])
        ctx = jnp.ones((1, 10, 64))
        v = self._init(m, x4, t, ctx, None)
        out = m.apply(v, jnp.zeros((1, 4, 6, 16, 16)), t, ctx, None)
        assert out.shape == (1, 8, 6, 16, 16)

    def test_scanned_param_stacking(self):
        m = tiny_t2v(num_layers=3)
        x = jnp.zeros((1, 4, 4, 16, 16))
        v = self._init(m, x, jnp.array([0]), jnp.ones((1, 10, 64)), None)
        q = v["params"]["blocks"]["spatial"]["attn1"]["to_q"]["kernel"]
        assert q.shape == (3, 32, 32)


class TestT2VOptions:
    def test_gradient_checkpointing_matches_plain(self):
        m_plain = tiny_t2v()
        m_remat = tiny_t2v(gradient_checkpointing=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 16, 16))
        t = jnp.array([5])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 64))
        v = m_plain.init({"params": jax.random.PRNGKey(2)}, x, t, ctx, None)

        def loss(m, p):
            return jnp.sum(m.apply(p, x, t, ctx, None) ** 2)

        l1, g1 = jax.value_and_grad(lambda p: loss(m_plain, p))(v)
        l2, g2 = jax.value_and_grad(lambda p: loss(m_remat, p))(v)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestChunkedFeedForward:
    def test_chunked_ff_equivalence(self):
        """feed_forward_chunk_size must not change outputs (reference
        `latte_t2v.py:267-270,368-383` set_chunk_feed_forward semantics)."""
        m_plain = tiny_t2v()
        m_chunked = tiny_t2v(feed_forward_chunk_size=16)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 16, 16))
        t = jnp.array([10])
        ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 64))
        mask = jnp.ones((1, 10), jnp.int32)
        v = m_plain.init({"params": jax.random.PRNGKey(0)}, x, t, ctx, mask)
        a = m_plain.apply(v, x, t, ctx, mask)
        b = m_chunked.apply(v, x, t, ctx, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_chunked_ff_indivisible_raises(self):
        import pytest

        m = tiny_t2v(feed_forward_chunk_size=7)
        x = jnp.zeros((1, 4, 4, 16, 16))
        t = jnp.array([0])
        ctx = jnp.ones((1, 10, 64))
        mask = jnp.ones((1, 10), jnp.int32)
        with pytest.raises(ValueError, match="chunk"):
            m.init({"params": jax.random.PRNGKey(0)}, x, t, ctx, mask)
