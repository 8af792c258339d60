"""Tensor-parallel sharding: correctness of rules and numerical equivalence
between tp=1 and tp=2 executions of the same model."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from latte_tpu.dist.mesh import MeshConfig, make_mesh
from latte_tpu.dist.sharding import param_shardings, shard_params
from latte_tpu.models import Latte


def tiny_model():
    return Latte(
        input_size=8, patch_size=2, hidden_size=32, depth=4, num_heads=4,
        num_frames=2, attention_mode="xla",
    )


def init_params(model):
    x = jnp.zeros((2, 2, 4, 8, 8))
    return model.init({"params": jax.random.PRNGKey(0)}, x, jnp.zeros((2,), jnp.int32))


class TestTPSharding:
    def test_rules_shard_block_weights_only(self):
        model = tiny_model()
        variables = init_params(model)
        mesh = make_mesh(MeshConfig(dp=4, tp=2))
        shardings = param_shardings(variables["params"], mesh)
        qkv = shardings["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
        assert qkv.spec == P(None, None, "tp")
        proj = shardings["blocks"]["spatial"]["attn"]["proj"]["kernel"]
        assert proj.spec == P(None, "tp", None)
        fc1 = shardings["blocks"]["temporal"]["mlp"]["fc1"]["kernel"]
        assert fc1.spec == P(None, None, "tp")
        fc2 = shardings["blocks"]["temporal"]["mlp"]["fc2"]["kernel"]
        assert fc2.spec == P(None, "tp", None)
        # non-block params replicated
        assert shardings["x_embedder"]["proj"]["kernel"].spec == P()
        assert shardings["final_layer"]["linear"]["kernel"].spec == P()

    def test_tp_matches_replicated_numerics(self):
        """Forward under dp=4,tp=2 must equal the unsharded forward."""
        model = tiny_model()
        variables = init_params(model)
        # perturb so outputs are non-trivial (adaLN-zero init outputs zeros)
        keys = iter(jax.random.split(jax.random.PRNGKey(5), 10_000))
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, a.dtype),
            variables["params"],
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 4, 8, 8))
        t = jnp.array([1, 2, 3, 4])

        ref = model.apply({"params": params}, x, t)

        mesh = make_mesh(MeshConfig(dp=4, tp=2))
        with mesh:
            sharded = shard_params({"params": params}, mesh)
            xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
            out = jax.jit(lambda v, xx, tt: model.apply(v, xx, tt))(sharded, xs, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestZero1:
    def test_opt_state_sharded_training_step(self):
        import optax

        from latte_tpu.core.diffusion import create_diffusion
        from latte_tpu.dist.sharding import zero1_opt_shardings
        from latte_tpu.train import TrainState, create_train_state, make_train_step
        from latte_tpu.train.state import make_optimizer

        model = tiny_model()
        variables = init_params(model)
        diffusion = create_diffusion("", diffusion_steps=50)
        optimizer = make_optimizer(lr=1e-3)
        state = create_train_state(variables["params"], optimizer)
        mesh = make_mesh(MeshConfig(dp=8, tp=1))

        opt_sh = zero1_opt_shardings(state.opt_state, mesh)
        rep = NamedSharding(mesh, P())
        state_sh = TrainState(
            step=rep,
            params=jax.tree_util.tree_map(lambda _: rep, state.params),
            ema_params=jax.tree_util.tree_map(lambda _: rep, state.ema_params),
            opt_state=opt_sh,
        )
        with mesh:
            state = jax.tree_util.tree_map(jax.device_put, state, state_sh)
            step = jax.jit(
                make_train_step(model, diffusion, optimizer),
                in_shardings=(state_sh, NamedSharding(mesh, P("dp")), None),
                out_shardings=(state_sh, None),
                donate_argnums=(0,),
            )
            batch = jax.device_put(
                jnp.ones((8, 2, 4, 8, 8)) * 0.1, NamedSharding(mesh, P("dp"))
            )
            new_state, metrics = step(state, {"latents": batch}, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # a big moment leaf must actually be dp-sharded
        mu = new_state.opt_state[0].mu["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
        assert not mu.sharding.is_fully_replicated
        # params remain replicated
        p = new_state.params["blocks"]["spatial"]["attn"]["qkv"]["kernel"]
        assert p.sharding.is_fully_replicated
