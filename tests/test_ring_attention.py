"""Ring attention vs single-device attention on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from latte_tpu.dist.ring import ring_attention_sharded
from latte_tpu.kernels.attention import attention_reference

B, N, H, D = 2, 64, 2, 16


def _qkv(seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (B, N, H, D), dtype)
    return tuple(mk(k) for k in ks)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


class TestRingAttention:
    @pytest.mark.parametrize("n_dev", [1, 2, 8])
    def test_forward_matches_full_attention(self, n_dev):
        q, k, v = _qkv()
        mesh = _mesh(n_dev)
        out = jax.jit(lambda q, k, v: ring_attention_sharded(q, k, v, mesh))(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_indivisible_head_or_batch_axes_fall_back_to_replicated(self):
        # heads (2) not divisible by tp=4, batch (2) not divisible by dp=4:
        # those dims must simply replicate rather than erroring in shard_map
        q, k, v = _qkv(3)
        devs = np.array(jax.devices()[:8]).reshape(1, 2, 4)
        mesh = Mesh(devs, ("dp", "sp", "tp"))
        out = jax.jit(lambda q, k, v: ring_attention_sharded(q, k, v, mesh))(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_indivisible_token_axis_raises_clearly(self):
        q, k, v = _qkv(4)
        mesh = Mesh(np.array(jax.devices()[:3]), ("sp",))  # 64 % 3 != 0
        with pytest.raises(ValueError, match="not divisible"):
            ring_attention_sharded(q, k, v, mesh)

    def test_grad_matches_full_attention(self):
        q, k, v = _qkv(1)
        mesh = _mesh(8)

        def loss_ring(q, k, v):
            o = ring_attention_sharded(q, k, v, mesh)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v).astype(jnp.float32) ** 2)

        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        for a, b, name in zip(g_ring, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name}"
            )

    def test_model_ring_mode_matches_xla(self):
        # Full Latte with attention_mode="ring": spatial sequences (T=64)
        # ring over 8 devices; temporal sequences (F=4, not divisible)
        # auto-fall back to xla.
        from latte_tpu.models.dit import Latte

        mesh = _mesh(8)
        kw = dict(
            input_size=16,
            patch_size=2,
            num_frames=4,
            extras=1,
            learn_sigma=True,
            hidden_size=32,
            depth=2,
            num_heads=2,
        )
        ref = Latte(**kw, attention_mode="xla")
        ring = Latte(**kw, attention_mode="ring", ring_mesh=mesh, ring_axis="sp")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16, 16))
        t = jnp.array([7, 300], jnp.int32)
        params = ref.init({"params": jax.random.PRNGKey(1)}, x, t)
        out_ref = ref.apply(params, x, t)
        out_ring = jax.jit(lambda p, x, t: ring.apply(p, x, t))(params, x, t)
        np.testing.assert_allclose(
            np.asarray(out_ring), np.asarray(out_ref), atol=3e-5
        )

    def test_bf16_accumulation(self):
        # bf16 inputs over the full 8-ring: the fp32 running accumulator
        # must keep the result at single-merge error scale, not n-compounded
        q, k, v = (a.astype(jnp.bfloat16) for a in _qkv(3))
        mesh = _mesh(8)
        out = jax.jit(lambda q, k, v: ring_attention_sharded(q, k, v, mesh))(q, k, v)
        assert out.dtype == jnp.bfloat16
        ref = attention_reference(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        rel = np.linalg.norm(np.asarray(out, np.float64) - np.asarray(ref, np.float64)) / (
            np.linalg.norm(np.asarray(ref, np.float64)) + 1e-12
        )
        assert rel < 0.02, rel

    def test_ring_mode_requires_mesh(self):
        from latte_tpu.models.layers import Attention

        attn = Attention(dim=32, num_heads=2, mode="ring")
        x = jnp.zeros((1, 64, 32))
        with pytest.raises(ValueError, match="requires constructing"):
            attn.init({"params": jax.random.PRNGKey(0)}, x)

    def test_t2v_ring_mode_matches_xla(self):
        # LatteT2V self-attention rings over sp (spatial T=64); temporal
        # (F=4) and cross-attention (masked T5 context) fall back to xla
        from latte_tpu.models.t2v import LatteT2V

        mesh = _mesh(8)
        cfg = dict(
            num_attention_heads=2,
            attention_head_dim=16,
            num_layers=2,
            patch_size=2,
            sample_size=16,
            cross_attention_dim=32,
            caption_channels=64,
            video_length=4,
        )
        ref = LatteT2V(**cfg, attention_mode="xla")
        ring = LatteT2V(**cfg, attention_mode="ring", ring_mesh=mesh)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 32, 32))
        t = jnp.array([21])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 64))
        mask = jnp.ones((1, 10), jnp.int32)
        params = ref.init({"params": jax.random.PRNGKey(2)}, x, t, ctx, mask)
        out_ref = ref.apply(params, x, t, ctx, mask)
        out_ring = jax.jit(
            lambda p, x, t, c, m: ring.apply(p, x, t, c, m)
        )(params, x, t, ctx, mask)
        np.testing.assert_allclose(
            np.asarray(out_ring), np.asarray(out_ref), atol=3e-5
        )

    def test_uneven_softmax_mass(self):
        # one giant logit on a remote shard: the running max must travel
        # the ring correctly (exercises the logsumexp merge, not just the
        # average case)
        q, k, v = _qkv(2)
        q = q.at[:, 0].set(q[:, 0] * 8.0)
        k = k.at[:, N - 1].set(q[:, 0] * 8.0)  # huge score for token 0 vs N-1
        mesh = _mesh(8)
        out = jax.jit(lambda q, k, v: ring_attention_sharded(q, k, v, mesh))(q, k, v)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
