"""Mixture-of-Experts FF + expert parallelism (models/moe.py, mesh "ep").

Beyond-reference feature (the reference FF is a dense MLP,
`/root/reference/models/latte.py:63-78`): routing semantics are pinned
against a per-token numpy re-implementation, the E=1 degenerate case
against the dense Mlp, and the ep-sharded train step against the plain
step on the 8-virtual-device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latte_tpu.models.layers import Mlp
from latte_tpu.models.moe import MoEMlp


def _np_moe(x, router, wi, bi, wo, bo, top_k, capacity_factor, group_size=None):
    """Per-token numpy mirror of MoEMlp's routing + capacity semantics.

    ``group_size=None`` = one global dispatch group (the default tiny-S
    case); otherwise capacity is allocated per contiguous token group,
    matching MoEMlp's GShard grouping.
    """
    S, D = x.shape
    E = router.shape[1]
    k = min(top_k, E)
    g = S if group_size is None else min(group_size, S)
    while S % g:
        g -= 1
    C = max(1, int(np.ceil(g * k * capacity_factor / E)))
    C = min(C, g)

    logits = x.astype(np.float64) @ router.astype(np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)

    choices = np.zeros((S, k), np.int64)
    gates = np.zeros((S, k))
    p = probs.copy()
    for j in range(k):
        choices[:, j] = p.argmax(-1)
        gates[:, j] = probs[np.arange(S), choices[:, j]]
        p[np.arange(S), choices[:, j]] = 0.0
    if k > 1:
        gates = gates / (gates.sum(-1, keepdims=True) + 1e-9)

    def expert(e, v):
        h = v @ wi[e] + bi[e]
        # gelu(tanh approx)
        h = 0.5 * h * (1 + np.tanh(np.sqrt(2 / np.pi) * (h + 0.044715 * h**3)))
        return h @ wo[e] + bo[e]

    counts = np.zeros((S // g, E), np.int64)  # per-group expert queues
    kept = np.zeros((S, k), bool)
    for j in range(k):  # choice 0 for ALL tokens queues before choice 1
        for s in range(S):
            e = choices[s, j]
            grp = s // g
            if counts[grp, e] < C:
                kept[s, j] = True
            counts[grp, e] += 1

    y = np.zeros((S, wo.shape[-1]))
    for s in range(S):
        for j in range(k):
            if kept[s, j]:
                y[s] += gates[s, j] * expert(choices[s, j], x[s].astype(np.float64))
    return y, probs, choices


class TestMoEMlp:
    def _params(self, rng, D, H, E, O=None):
        O = O or D
        ks = jax.random.split(rng, 5)
        return {
            "router": jax.random.normal(ks[0], (D, E)) * 0.5,
            "wi": jax.random.normal(ks[1], (E, D, H)) * 0.3,
            "bi": jax.random.normal(ks[2], (E, H)) * 0.1,
            "wo": jax.random.normal(ks[3], (E, H, O)) * 0.3,
            "bo": jax.random.normal(ks[4], (E, O)) * 0.1,
        }

    def test_matches_numpy_reference_top1(self):
        D, H, E = 8, 16, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, D))
        params = self._params(jax.random.PRNGKey(1), D, H, E)
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E,
                   top_k=1, capacity_factor=1.0)
        out = m.apply({"params": params}, x)
        ref, _, _ = _np_moe(
            np.asarray(x).reshape(12, D),
            *(np.asarray(params[n]) for n in ("router", "wi", "bi", "wo", "bo")),
            top_k=1, capacity_factor=1.0,
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(12, D), ref, atol=1e-5
        )

    def test_matches_numpy_reference_top2(self):
        D, H, E = 8, 16, 4
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, D))
        params = self._params(jax.random.PRNGKey(3), D, H, E)
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E,
                   top_k=2, capacity_factor=1.25)
        out = m.apply({"params": params}, x)
        ref, _, _ = _np_moe(
            np.asarray(x).reshape(15, D),
            *(np.asarray(params[n]) for n in ("router", "wi", "bi", "wo", "bo")),
            top_k=2, capacity_factor=1.25,
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(15, D), ref, atol=1e-5
        )

    def test_single_expert_equals_dense_mlp(self):
        """E=1: router prob is identically 1 and capacity covers every
        token, so MoEMlp must reproduce Mlp with the same weights."""
        D, H = 8, 16
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 7, D))
        mlp = Mlp(hidden_features=H, out_features=D)
        mp = mlp.init(jax.random.PRNGKey(5), x)["params"]
        moe_params = {
            "router": jnp.zeros((D, 1)),
            "wi": mp["fc1"]["kernel"][None],
            "bi": mp["fc1"]["bias"][None],
            "wo": mp["fc2"]["kernel"][None],
            "bo": mp["fc2"]["bias"][None],
        }
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=1,
                   top_k=1, capacity_factor=1.0)
        out = m.apply({"params": moe_params}, x)
        ref = mlp.apply({"params": mp}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_capacity_overflow_drops_tokens(self):
        """A router hard-biased to expert 0 with capacity 1: exactly one
        token gets FF output; the rest are dropped to zero."""
        D, H, E = 4, 8, 4
        S = 8
        x = jnp.ones((1, S, D)) + jnp.arange(S)[None, :, None] * 0.01
        params = self._params(jax.random.PRNGKey(6), D, H, E)
        params["router"] = jnp.zeros((D, E)).at[:, 0].set(10.0)
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E,
                   top_k=1, capacity_factor=1.0 / S)  # C = ceil(S*1*(1/S)/E)=1
        out = np.asarray(m.apply({"params": params}, x))[0]
        nonzero = np.abs(out).sum(-1) > 1e-9
        assert nonzero[0] and not nonzero[1:].any(), nonzero

    def test_aux_loss_formula(self):
        D, H, E = 8, 16, 4
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, D))
        params = self._params(jax.random.PRNGKey(8), D, H, E)
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E, top_k=2)
        _, mut = m.apply({"params": params}, x, mutable=["intermediates"])
        aux = float(mut["intermediates"]["moe_aux_loss"][0])
        _, probs, choices = _np_moe(
            np.asarray(x).reshape(16, D),
            *(np.asarray(params[n]) for n in ("router", "wi", "bi", "wo", "bo")),
            top_k=2, capacity_factor=1.25,
        )
        f = np.bincount(choices[:, 0], minlength=E) / 16.0
        P = probs.mean(0)
        np.testing.assert_allclose(aux, E * np.sum(f * P), rtol=1e-5)

    def test_grads_flow_to_all_param_kinds(self):
        D, H, E = 8, 16, 4
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, D))
        params = self._params(jax.random.PRNGKey(10), D, H, E)
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E, top_k=2)

        g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(params)
        for name in ("router", "wi", "bi", "wo", "bo"):
            assert float(jnp.abs(g[name]).max()) > 0, name


class TestMoELatte:
    def _model(self, **kw):
        from latte_tpu.models import Latte

        return Latte(
            input_size=8, patch_size=2, hidden_size=32, depth=4,
            num_heads=2, num_frames=2, extras=1, attention_mode="xla",
            moe_experts=4, moe_top_k=2, **kw,
        )

    def test_forward_and_aux_sow(self):
        m = self._model()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 4, 8, 8))
        t = jnp.zeros((2,), jnp.int32)
        v = m.init({"params": jax.random.PRNGKey(1)}, x, t)
        out, mut = m.apply(v, x, t, mutable=["intermediates"])
        assert out.shape == (2, 2, 8, 8, 8)
        assert np.isfinite(np.asarray(out)).all()
        stacked = mut["intermediates"]["blocks"]["spatial"]["moe"]["moe_aux_loss"][0]
        assert stacked.shape == (2,)  # one aux value per scanned pair
        # expert weights carry (n_pairs, E, ...) stacked axes
        wi = v["params"]["blocks"]["spatial"]["moe"]["wi"]
        assert wi.shape[:2] == (2, 4)
        # plain apply (sampling path) needs no mutable plumbing
        out2 = m.apply(v, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2))

    @pytest.mark.slow
    def test_train_step_with_aux(self):
        from latte_tpu.core.diffusion import create_diffusion
        from latte_tpu.train import create_train_state, make_train_step
        from latte_tpu.train.state import make_optimizer

        m = self._model()
        diffusion = create_diffusion("", diffusion_steps=50)
        optimizer = make_optimizer(lr=1e-3)
        x = jnp.zeros((2, 2, 4, 8, 8))
        v = m.init({"params": jax.random.PRNGKey(0)}, x, jnp.zeros((2,), jnp.int32))
        state = create_train_state(v["params"], optimizer)
        step = jax.jit(
            make_train_step(m, diffusion, optimizer, moe_aux_weight=0.01)
        )
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (4, 2, 4, 8, 8)) * 0.5
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))
        # aux is reported and lower-bounded by 1 (uniform routing optimum)
        assert float(metrics["moe_aux"]) >= 1.0 - 1e-3
        # the router trains immediately via the aux loss; expert weights
        # sit behind the zero-initialized adaLN gate, so their first
        # nonzero gradient arrives on step 2 (after the gate un-zeros)
        before_r = v["params"]["blocks"]["spatial"]["moe"]["router"]
        assert float(jnp.abs(state.params["blocks"]["spatial"]["moe"]["router"] - before_r).max()) > 0
        before_wi = state.params["blocks"]["spatial"]["moe"]["wi"]
        state, _ = step(state, batch, jax.random.PRNGKey(4))
        after_wi = state.params["blocks"]["spatial"]["moe"]["wi"]
        assert float(jnp.abs(after_wi - before_wi).max()) > 0


@pytest.mark.slow
class TestExpertParallel:
    def test_ep_sharded_step_matches_plain(self, capfd):
        """dp=2 x ep=4 train step with expert weights sharded over ep:
        must compile without involuntary rematerialization and produce
        the same loss trajectory as the unsharded step."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from latte_tpu.core.diffusion import create_diffusion
        from latte_tpu.dist.mesh import MeshConfig, make_mesh
        from latte_tpu.dist.sharding import ep_param_shardings
        from latte_tpu.models import Latte
        from latte_tpu.train import create_train_state, make_train_step
        from latte_tpu.train.state import TrainState, make_optimizer

        model = Latte(
            input_size=8, patch_size=2, hidden_size=32, depth=4,
            num_heads=2, num_frames=2, extras=1, attention_mode="xla",
            moe_experts=4, moe_top_k=2, moe_ep_axis="ep",
        )
        diffusion = create_diffusion("", diffusion_steps=50)
        optimizer = make_optimizer(lr=1e-3)
        # moe_ep_axis only adds sharding constraints, which need the mesh
        # context — init and the single-device reference drop it
        ref_model = model.clone(moe_ep_axis=None)
        x0 = jnp.zeros((2, 2, 4, 8, 8))
        v = ref_model.init(
            {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((2,), jnp.int32)
        )
        state0 = create_train_state(v["params"], optimizer)
        step_fn = make_train_step(model, diffusion, optimizer, moe_aux_weight=0.01)
        batch = {
            "latents": jax.random.normal(jax.random.PRNGKey(2), (4, 2, 4, 8, 8)) * 0.5
        }
        rng = jax.random.PRNGKey(3)
        ref_step = jax.jit(
            make_train_step(ref_model, diffusion, optimizer, moe_aux_weight=0.01)
        )
        ref_state, ref_metrics = ref_step(state0, batch, rng)

        mesh = make_mesh(MeshConfig(dp=2, ep=4))
        with mesh:
            p_shard = ep_param_shardings(state0.params, mesh)
            state_sh = TrainState(
                step=NamedSharding(mesh, P()),
                params=p_shard,
                ema_params=p_shard,
                opt_state=ep_param_shardings(state0.opt_state, mesh),
            )
            state = jax.tree_util.tree_map(jax.device_put, state0, state_sh)
            batch_sh = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P("dp"))), batch
            )
            jitted = jax.jit(
                step_fn,
                in_shardings=(state_sh, NamedSharding(mesh, P("dp")), None),
                out_shardings=(state_sh, None),
            )
            state, metrics = jitted(state, batch_sh, rng)
            # expert weights stayed ep-sharded through the update
            wi = state.params["blocks"]["spatial"]["moe"]["wi"]
            assert wi.sharding.is_equivalent_to(
                NamedSharding(mesh, P(None, "ep")), wi.ndim
            ), wi.sharding

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(jax.device_get(state.params["blocks"]["spatial"]["moe"]["wi"])),
            np.asarray(jax.device_get(ref_state.params["blocks"]["spatial"]["moe"]["wi"])),
            atol=2e-5,
        )
        err = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in err, err[-3000:]


class TestMoET2V:
    def test_geglu_single_expert_matches_t2v_ff(self):
        """E=1 geglu MoE must reproduce T2VFeedForward(geglu) with the
        same weights (net_0_proj -> wi, net_2 -> wo)."""
        from latte_tpu.models.t2v import T2VFeedForward

        D = 8
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, D))
        ff = T2VFeedForward(dim=D, activation_fn="geglu")
        fp = ff.init(jax.random.PRNGKey(1), x)["params"]
        moe_params = {
            "router": jnp.zeros((D, 1)),
            "wi": fp["net_0_proj"]["kernel"][None],
            "bi": fp["net_0_proj"]["bias"][None],
            "wo": fp["net_2"]["kernel"][None],
            "bo": fp["net_2"]["bias"][None],
        }
        m = MoEMlp(hidden_features=D * 4, out_features=D, num_experts=1,
                   top_k=1, capacity_factor=1.0, activation_fn="geglu")
        out = m.apply({"params": moe_params}, x)
        ref = ff.apply({"params": fp}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_latte_t2v_moe_forward_and_aux(self):
        """LatteT2V with moe_experts: geglu expert FFs in both block
        columns, aux losses sown per scanned pair, plain apply clean."""
        from latte_tpu.models.t2v import LatteT2V

        model = LatteT2V(
            num_attention_heads=2, attention_head_dim=8, num_layers=2,
            patch_size=2, sample_size=8, cross_attention_dim=16,
            caption_channels=12, video_length=2, activation_fn="geglu",
            attention_mode="xla", moe_experts=4, moe_top_k=2,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 16, 16))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 12))
        v = model.init({"params": jax.random.PRNGKey(2)}, x, t, ctx)
        out, mut = model.apply(v, x, t, ctx, mutable=["intermediates"])
        assert out.shape == (1, 8, 2, 16, 16)
        assert np.isfinite(np.asarray(out)).all()
        aux = mut["intermediates"]["blocks"]["spatial"]["moe"]["moe_aux_loss"][0]
        assert aux.shape == (2,)
        # geglu experts: wi projects to 2*(4D) per expert
        wi = v["params"]["blocks"]["spatial"]["moe"]["wi"]
        assert wi.shape == (2, 4, 16, 2 * 64), wi.shape
        # plain apply (serving path) needs no mutable plumbing
        out2 = model.apply(v, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


class TestEpShardingRules:
    """Spec-level checks of ep_param_shardings and its FSDP composition
    (no compile — runs on abstract shapes)."""

    def _param_shapes(self):
        from latte_tpu.models import Latte

        model = Latte(
            input_size=8, patch_size=2, hidden_size=32, depth=4,
            num_heads=2, num_frames=2, extras=1, attention_mode="xla",
            moe_experts=4, moe_top_k=2,
        )
        x = jnp.zeros((1, 2, 4, 8, 8))
        t = jnp.zeros((1,), jnp.int32)
        return jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, x, t)
        )["params"]

    def test_ep_rule_shards_expert_axis_only(self):
        from jax.sharding import PartitionSpec as P

        from latte_tpu.dist.mesh import MeshConfig, make_mesh
        from latte_tpu.dist.sharding import ep_param_shardings

        mesh = make_mesh(MeshConfig(dp=2, ep=4))
        shardings = ep_param_shardings(self._param_shapes(), mesh)
        moe = shardings["blocks"]["spatial"]["moe"]
        # scanned stack prepends n_pairs: expert axis is 1 (trailing
        # dims unsharded)
        for name in ("wi", "wo", "bi"):
            spec = tuple(moe[name].spec)
            assert spec[1] == "ep" and all(
                s is None for i, s in enumerate(spec) if i != 1
            ), (name, spec)
        # router is tiny and NOT expert-stacked — replicated
        assert moe["router"].spec == P()
        # non-MoE block weights keep their usual (here: replicated) spec
        assert "ep" not in jax.tree_util.tree_leaves(
            [shardings["blocks"]["spatial"]["attn"]["qkv"]["kernel"].spec]
        )

    def test_fsdp_rule_composes_ep_then_dp(self):
        from latte_tpu.dist.mesh import MeshConfig, make_mesh
        from latte_tpu.dist.sharding import fsdp_param_shardings

        mesh = make_mesh(MeshConfig(dp=4, ep=2))
        shardings = fsdp_param_shardings(self._param_shapes(), mesh)
        moe = shardings["blocks"]["spatial"]["moe"]
        # expert axis pinned to ep FIRST, then the largest remaining
        # dp-divisible axis takes dp — full 2-axis weight sharding
        wi_spec = tuple(moe["wi"].spec)
        assert wi_spec[1] == "ep", wi_spec
        assert "dp" in wi_spec, wi_spec
        # without an ep axis on the mesh the same rule must not emit "ep"
        mesh_dp = make_mesh(MeshConfig(dp=8))
        sh_dp = fsdp_param_shardings(self._param_shapes(), mesh_dp)
        assert "ep" not in tuple(sh_dp["blocks"]["spatial"]["moe"]["wi"].spec)


class TestGroupedDispatch:
    """GShard grouping: capacity per token group, memory linear in S."""

    def test_grouped_matches_numpy_reference(self):
        D, H, E = 8, 16, 4
        x = jax.random.normal(jax.random.PRNGKey(11), (3, 8, D))  # S=24
        ks = jax.random.split(jax.random.PRNGKey(12), 5)
        params = {
            "router": jax.random.normal(ks[0], (D, E)) * 0.5,
            "wi": jax.random.normal(ks[1], (E, D, H)) * 0.3,
            "bi": jax.random.normal(ks[2], (E, H)) * 0.1,
            "wo": jax.random.normal(ks[3], (E, H, D)) * 0.3,
            "bo": jax.random.normal(ks[4], (E, D)) * 0.1,
        }
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E,
                   top_k=2, capacity_factor=1.0, group_size=6)  # G=4, g=6
        out = m.apply({"params": params}, x)
        ref, _, _ = _np_moe(
            np.asarray(x).reshape(24, D),
            *(np.asarray(params[n]) for n in ("router", "wi", "bi", "wo", "bo")),
            top_k=2, capacity_factor=1.0, group_size=6,
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(24, D), ref, atol=1e-5
        )

    def test_group_divisor_fallback(self):
        """S=10, group_size=4: falls back to the largest divisor g=2."""
        D, H, E = 4, 8, 2
        x = jax.random.normal(jax.random.PRNGKey(13), (1, 10, D))
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E,
                   top_k=1, capacity_factor=2.0, group_size=4)
        v = m.init(jax.random.PRNGKey(14), x)
        out = m.apply(v, x)
        assert out.shape == (1, 10, D)
        assert np.isfinite(np.asarray(out)).all()

    def test_capacity_is_per_group(self):
        """Router hard-biased to expert 0, capacity 1 per group: the
        FIRST token of EVERY group survives (vs one global survivor)."""
        D, H, E = 4, 8, 4
        x = jnp.ones((1, 8, D)) + jnp.arange(8)[None, :, None] * 0.01
        ks = jax.random.split(jax.random.PRNGKey(15), 5)
        params = {
            "router": jnp.zeros((D, E)).at[:, 0].set(10.0),
            "wi": jax.random.normal(ks[1], (E, D, H)) * 0.3,
            "bi": jax.random.normal(ks[2], (E, H)) * 0.1,
            "wo": jax.random.normal(ks[3], (E, H, D)) * 0.3,
            "bo": jax.random.normal(ks[4], (E, D)) * 0.1,
        }
        # g=4 -> C = ceil(4*1*0.25/4) = 1 per group; groups = tokens 0-3, 4-7
        m = MoEMlp(hidden_features=H, out_features=D, num_experts=E,
                   top_k=1, capacity_factor=0.25, group_size=4)
        out = np.asarray(m.apply({"params": params}, x))[0]
        nonzero = np.abs(out).sum(-1) > 1e-9
        assert nonzero[0] and nonzero[4], nonzero
        assert not nonzero[[1, 2, 3, 5, 6, 7]].any(), nonzero


def test_quantized_moe_rejected():
    """W8A8/QAT has no MoE expert path — the combination must fail
    loudly at trace time, not silently serve a full-precision FF."""
    from latte_tpu.models import Latte

    m = Latte(
        input_size=8, patch_size=2, hidden_size=32, depth=4,
        num_heads=2, num_frames=2, extras=1, attention_mode="xla",
        moe_experts=4, quantized=True,
    )
    x = jnp.zeros((1, 2, 4, 8, 8))
    with pytest.raises(NotImplementedError, match="moe_experts"):
        m.init({"params": jax.random.PRNGKey(0)}, x, jnp.zeros((1,), jnp.int32))
