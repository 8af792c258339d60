"""Pipeline parallelism: GPipe schedule == plain scanned stack, fwd and bwd."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from latte_tpu.dist.pipeline import (
    gpipe,
    make_pipelined_apply,
    pipelined_latte_forward,
)
from latte_tpu.models.dit import Latte


def _mesh(n, axis="pp"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


class TestGpipe:
    def _setup(self, n_units=4, M=4, d=8):
        rng = jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 3)
        params = {
            "w": jax.random.normal(ks[0], (n_units, d, d)) * 0.3,
            "b": jax.random.normal(ks[1], (n_units, d)) * 0.1,
        }
        x = jax.random.normal(ks[2], (M, 2, d))
        return params, x

    @staticmethod
    def _stage_fn(params_local, x, unit_offset):
        def body(carry, sliced):
            w, b = sliced
            return jnp.tanh(carry @ w + b), None

        out, _ = jax.lax.scan(body, x, (params_local["w"], params_local["b"]))
        return out

    @staticmethod
    def _reference(params, x):
        def body(carry, sliced):
            w, b = sliced
            return jnp.tanh(carry @ w + b), None

        out, _ = jax.lax.scan(body, x, (params["w"], params["b"]))
        return out

    @pytest.mark.parametrize("S,M", [(2, 4), (4, 4), (4, 1), (2, 6)])
    def test_matches_sequential(self, S, M):
        params, x = self._setup(n_units=4, M=M)
        mesh = _mesh(S)
        out = jax.jit(
            lambda p, v: gpipe(self._stage_fn, p, v, mesh, axis="pp")
        )(params, x)
        ref = jax.vmap(lambda xi: self._reference(params, xi))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_grad_matches(self):
        params, x = self._setup(n_units=4, M=4)
        mesh = _mesh(2)

        def loss_pipe(p, v):
            return gpipe(self._stage_fn, p, v, mesh, axis="pp").sum()

        def loss_ref(p, v):
            return jax.vmap(lambda xi: self._reference(p, xi))(v).sum()

        g_pipe = jax.jit(jax.grad(loss_pipe))(params, x)
        g_ref = jax.jit(jax.grad(loss_ref))(params, x)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(g_pipe[k]), np.asarray(g_ref[k]), atol=1e-5,
                err_msg=k,
            )

    def test_unit_offset_reaches_stages(self):
        # stage_fn that adds its absolute unit indices: distinguishes a
        # wrong offset immediately
        params = {"w": jnp.zeros((4, 1))}
        x = jnp.zeros((2, 3, 1))
        mesh = _mesh(2)

        def stage_fn(params_local, xc, unit_offset):
            L = params_local["w"].shape[0]
            add = (unit_offset + jnp.arange(L)).sum().astype(xc.dtype)
            return xc + add

        out = gpipe(stage_fn, params, x, mesh, axis="pp")
        # stage0 adds 0+1, stage1 adds 2+3 -> total 6 everywhere
        np.testing.assert_allclose(np.asarray(out), 6.0)


class TestPipelinedLatte:
    def _model_and_inputs(self, extras=1, depth=4):
        kw = dict(
            input_size=8,
            patch_size=2,
            num_frames=4,
            extras=extras,
            learn_sigma=True,
            hidden_size=32,
            depth=depth,
            num_heads=2,
            attention_mode="xla",
            num_classes=10,
        )
        model = Latte(**kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 8, 8))
        t = jnp.array([3, 500, 77, 901], jnp.int32)
        y = jnp.array([1, 2, 3, 4], jnp.int32) if extras == 2 else None
        args = (x, t) if y is None else (x, t, y)
        variables = model.init({"params": jax.random.PRNGKey(1)}, *args)
        return model, variables, x, t, y

    @pytest.mark.parametrize("extras,M", [(1, 2), (1, 4), (2, 2)])
    def test_forward_matches_model_apply(self, extras, M):
        model, variables, x, t, y = self._model_and_inputs(extras=extras)
        mesh = _mesh(2)
        ref = (
            model.apply(variables, x, t)
            if y is None
            else model.apply(variables, x, t, y=y)
        )
        out = jax.jit(
            lambda v, x, t, y: pipelined_latte_forward(
                model, v, x, t, y, mesh=mesh, microbatches=M
            )
        )(variables, x, t, y)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_grad_through_pipeline(self):
        model, variables, x, t, y = self._model_and_inputs()
        mesh = _mesh(2)

        def loss_pipe(v):
            out = pipelined_latte_forward(
                model, v, x, t, mesh=mesh, microbatches=2
            )
            return (out.astype(jnp.float32) ** 2).mean()

        def loss_ref(v):
            return (model.apply(v, x, t).astype(jnp.float32) ** 2).mean()

        g_pipe = jax.jit(jax.grad(loss_pipe))(variables)["params"]
        g_ref = jax.jit(jax.grad(loss_ref))(variables)["params"]
        flat_p = jax.tree_util.tree_leaves_with_path(g_pipe)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(g_ref))
        for path, leaf in flat_p:
            np.testing.assert_allclose(
                np.asarray(leaf),
                np.asarray(flat_r[path]),
                atol=5e-5,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_remat_grads_match(self):
        # gradient_checkpointing must reach the pipelined pair (it is the
        # knob that makes big-model pp training fit); values AND grads
        # match the non-remat path
        model, variables, x, t, _ = self._model_and_inputs()
        rmodel = model.clone(gradient_checkpointing=True)
        mesh = _mesh(2)

        def loss(m):
            def f(v):
                out = pipelined_latte_forward(
                    m, v, x, t, mesh=mesh, microbatches=2
                )
                return (out.astype(jnp.float32) ** 2).mean()

            return f

        l_plain, g_plain = jax.value_and_grad(loss(model))(variables)
        l_remat, g_remat = jax.value_and_grad(loss(rmodel))(variables)
        np.testing.assert_allclose(float(l_remat), float(l_plain), rtol=1e-6)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(g_plain))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_remat):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_p[path]), atol=5e-5,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_train_mode_label_dropout_matches(self):
        # train-mode CFG label dropout goes through flax make_rng with the
        # scope path folded in — the pipelined forward must reproduce the
        # exact stream, not just "some dropout"
        model, variables, x, t, y = self._model_and_inputs(extras=2)
        mesh = _mesh(2)
        rng = jax.random.PRNGKey(7)
        ref = model.apply(
            variables, x, t, y=y, train=True, rngs={"label_dropout": rng}
        )
        out = pipelined_latte_forward(
            model, variables, x, t, y,
            mesh=mesh, microbatches=2, train=True, dropout_rng=rng,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_depth_14_pairs_pp7(self):
        # the real XL shape's 14 pairs admit pp=7: exercise uneven-looking
        # (but divisible) stage counts beyond 2
        model, variables, x, t, y = self._model_and_inputs(depth=28)
        mesh = _mesh(7)
        ref = model.apply(variables, x, t)
        out = jax.jit(
            lambda v: pipelined_latte_forward(
                model, v, x, t, mesh=mesh, microbatches=4
            )
        )(variables)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


class TestPipelinedLatteText:
    """extras=78 (CLIP text embedding conditioner) through the pipeline."""

    def test_text_conditioning_matches(self):
        model = Latte(
            input_size=8, patch_size=2, num_frames=4, extras=78,
            learn_sigma=True, hidden_size=32, depth=8, num_heads=2,
            attention_mode="xla",
        )
        B = 4
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 4, 8, 8))
        t = jnp.arange(B) * 50
        txt = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 16))
        variables = model.init(
            {"params": jax.random.PRNGKey(1)}, x, t, text_embedding=txt
        )
        ref = model.apply(variables, x, t, text_embedding=txt)
        out = pipelined_latte_forward(
            model, variables, x, t,
            mesh=_mesh(2), microbatches=2, text_embedding=txt,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestPipelinedLatteIMG:
    """Joint video+image batches (use_image_num) through the pipeline."""

    def _model_and_inputs(self, extras=2, use_image_num=2, B=4):
        from latte_tpu.models.dit_img import LatteIMG

        model = LatteIMG(
            input_size=8, patch_size=2, num_frames=4, extras=extras,
            use_image_num=use_image_num, learn_sigma=True, hidden_size=32,
            depth=8, num_heads=2, attention_mode="xla", num_classes=10,
        )
        Ftot = 4 + use_image_num
        x = jax.random.normal(jax.random.PRNGKey(0), (B, Ftot, 4, 8, 8))
        t = jnp.arange(B) * 50
        y = jnp.arange(B) % 10
        y_image = (jnp.arange(B * use_image_num) % 10).reshape(B, use_image_num)
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "label_dropout": jax.random.PRNGKey(2)},
            x, t, y=y, y_image=y_image, train=True,
        )
        return model, variables, x, t, y, y_image

    def test_joint_train_label_dropout_matches(self):
        # the shared y_embedder is called TWICE (y then y_image): the
        # pipelined forward must reproduce both make_rng fold counters
        from latte_tpu.dist.pipeline import pipelined_latte_img_forward

        model, variables, x, t, y, y_image = self._model_and_inputs()
        rng = jax.random.PRNGKey(7)
        ref = model.apply(
            variables, x, t, y=y, y_image=y_image, train=True,
            rngs={"label_dropout": rng},
        )
        out = pipelined_latte_img_forward(
            model, variables, x, t, y, y_image,
            mesh=_mesh(2), microbatches=2, train=True, dropout_rng=rng,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_eval_video_only_matches(self):
        from latte_tpu.dist.pipeline import pipelined_latte_img_forward

        model, variables, _, t, y, _ = self._model_and_inputs()
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 4, 4, 8, 8))
        ref = model.apply(variables, x, t, y=y)
        out = pipelined_latte_img_forward(
            model, variables, x, t, y, mesh=_mesh(4), microbatches=2,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestPipelinedT2V:
    """Depth-sharded LatteT2V forward == model.apply (serving path)."""

    def _model_and_inputs(self, num_layers=4, B=4):
        from latte_tpu.models.t2v import LatteT2V

        model = LatteT2V(
            num_attention_heads=2, attention_head_dim=16,
            num_layers=num_layers, patch_size=2, sample_size=8,
            cross_attention_dim=32, caption_channels=64, video_length=4,
            attention_mode="xla",
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 4, 16, 16))
        t = jnp.arange(B) * 100 + 3
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 10, 64))
        # mixed per-sample mask lengths: the bias path must microbatch
        mask = (jnp.arange(10)[None, :] < (5 + jnp.arange(B)[:, None])).astype(
            jnp.int32
        )
        variables = model.init({"params": jax.random.PRNGKey(1)}, x, t, ctx, mask)
        return model, variables, x, t, ctx, mask

    def test_matches_model_apply_pp2(self):
        from latte_tpu.dist.pipeline import pipelined_t2v_forward

        model, variables, x, t, ctx, mask = self._model_and_inputs()
        ref = model.apply(variables, x, t, ctx, mask)
        out = pipelined_t2v_forward(
            model, variables, x, t, ctx, mask,
            mesh=_mesh(2), microbatches=2,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_no_mask_pp4(self):
        from latte_tpu.dist.pipeline import pipelined_t2v_forward

        model, variables, x, t, ctx, _ = self._model_and_inputs()
        ref = model.apply(variables, x, t, ctx, None)
        out = pipelined_t2v_forward(
            model, variables, x, t, ctx, None,
            mesh=_mesh(4), microbatches=4,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestPipelinedTrainStep:
    """Full train step (loss -> grad -> AdamW -> EMA) with the block stack
    depth-sharded over pp, composed with dp in auto mode under one jit."""

    def test_dp2_pp4_matches_plain_step(self):
        from latte_tpu.core.diffusion import create_diffusion
        from latte_tpu.train import create_train_state, make_train_step
        from latte_tpu.train.state import make_optimizer

        model = Latte(
            input_size=8, patch_size=2, num_frames=4, extras=2,
            learn_sigma=True, hidden_size=32, depth=8, num_heads=2,
            attention_mode="xla", num_classes=10,
        )
        diffusion = create_diffusion("", diffusion_steps=100)
        optimizer = make_optimizer(lr=1e-3, warmup_steps=0)
        B = 4
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "label_dropout": jax.random.PRNGKey(2)},
            x, jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32),
        )
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(3), (B, 4, 4, 8, 8)),
            "y": jnp.array([1, 2, 3, 4], jnp.int32),
        }
        rng = jax.random.PRNGKey(42)

        state0 = create_train_state(variables["params"], optimizer)
        step_ref = make_train_step(model, diffusion, optimizer, extras=2)
        ref_state, ref_metrics = jax.jit(step_ref)(state0, batch, rng)

        devices = np.array(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devices, ("dp", "pp"))
        step_pp = make_train_step(
            model, diffusion, optimizer, extras=2,
            apply_fn=make_pipelined_apply(model, mesh, microbatches=2),
        )
        state1 = create_train_state(variables["params"], optimizer)
        with mesh:
            bshard = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P("dp"))), batch
            )
            pp_state, pp_metrics = jax.jit(step_pp)(state1, bshard, rng)

        np.testing.assert_allclose(
            float(pp_metrics["loss"]), float(ref_metrics["loss"]), atol=1e-5
        )
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_state.params))
        for path, leaf in jax.tree_util.tree_leaves_with_path(pp_state.params):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_ref[path]), atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )
