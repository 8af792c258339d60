"""VAE tests: shapes, posterior math, conv-orientation oracle vs torch,
diffusers-naming conversion structure."""

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.tools.convert_vae import convert_vae_state_dict
from latte_tpu.vae import AutoencoderKL, DiagonalGaussianDistribution
from latte_tpu.vae.autoencoder_kl import tiny_vae


class TestPosterior:
    def test_kl_zero_for_standard_normal(self):
        moments = jnp.concatenate(
            [jnp.zeros((2, 4, 2, 2)), jnp.zeros((2, 4, 2, 2))], axis=1
        )
        post = DiagonalGaussianDistribution(moments, axis=1)
        np.testing.assert_allclose(np.asarray(post.kl()), 0.0, atol=1e-6)

    def test_sample_statistics(self):
        moments = jnp.concatenate(
            [jnp.full((1, 1, 1, 1), 3.0), jnp.zeros((1, 1, 1, 1))], axis=1
        )
        post = DiagonalGaussianDistribution(moments, axis=1)
        samples = np.asarray(
            jax.vmap(lambda k: post.sample(k))(
                jax.random.split(jax.random.PRNGKey(0), 2000)
            )
        )
        assert abs(samples.mean() - 3.0) < 0.1
        assert abs(samples.std() - 1.0) < 0.1


class TestAutoencoderKL:
    def setup_method(self):
        self.vae = tiny_vae()
        x = jnp.zeros((1, 3, 16, 16))
        self.variables = self.vae.init({"params": jax.random.PRNGKey(0)}, x)

    def test_encode_decode_shapes(self):
        # 2 blocks -> one downsample -> f2
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        post = self.vae.apply(self.variables, x, method=self.vae.encode)
        assert post.mean.shape == (2, 4, 8, 8)
        z = post.mode()
        out = self.vae.apply(self.variables, z, method=self.vae.decode)
        assert out.shape == (2, 3, 16, 16)

    def test_full_call(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16))
        recon, post = self.vae.apply(self.variables, x, rng=jax.random.PRNGKey(2))
        assert recon.shape == x.shape
        assert np.isfinite(np.asarray(recon)).all()


class TestConvOrientation:
    def test_conv_conversion_matches_torch(self, rng_np):
        import torch
        import torch.nn.functional as tF

        import flax.linen as fnn

        w = rng_np.standard_normal((8, 3, 3, 3)).astype(np.float32)
        b = rng_np.standard_normal((8,)).astype(np.float32)
        x = rng_np.standard_normal((1, 3, 6, 6)).astype(np.float32)
        ref = tF.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1
        ).numpy()

        kernel = jnp.asarray(w.transpose(2, 3, 1, 0))
        conv = fnn.Conv(8, (3, 3), padding=1)
        ours = conv.apply(
            {"params": {"kernel": kernel, "bias": jnp.asarray(b)}},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
        np.testing.assert_allclose(
            np.asarray(ours.transpose(0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
        )

    def test_downsample_asymmetric_padding_matches_torch(self, rng_np):
        """SD downsample pads (0,1,0,1) then stride-2 VALID conv."""
        import torch
        import torch.nn.functional as tF

        from latte_tpu.vae.autoencoder_kl import Downsample

        w = rng_np.standard_normal((4, 4, 3, 3)).astype(np.float32)
        b = rng_np.standard_normal((4,)).astype(np.float32)
        x = rng_np.standard_normal((1, 4, 8, 8)).astype(np.float32)
        xt = tF.pad(torch.from_numpy(x), (0, 1, 0, 1))
        ref = tF.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), stride=2).numpy()

        ds = Downsample(channels=4)
        params = {
            "conv": {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
        }
        ours = ds.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(ours.transpose(0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
        )


class TestVAEConversion:
    def _make_diffusers_sd(self, rng, ch=(8, 16), layers=1, latent=4):
        """Synthesize a diffusers-named AutoencoderKL state dict for the tiny
        config (2 blocks, 1 layer per block, groups=4)."""
        sd = {}

        def conv(prefix, o, i, k=3):
            sd[f"{prefix}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def norm(prefix, c):
            sd[f"{prefix}.weight"] = rng.standard_normal((c,)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal((c,)).astype(np.float32)

        def lin(prefix, o, i):
            sd[f"{prefix}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def resnet(prefix, i, o):
            norm(f"{prefix}.norm1", i)
            conv(f"{prefix}.conv1", o, i)
            norm(f"{prefix}.norm2", o)
            conv(f"{prefix}.conv2", o, o)
            if i != o:
                conv(f"{prefix}.conv_shortcut", o, i, k=1)

        def attn(prefix, c):
            norm(f"{prefix}.group_norm", c)
            for n in ("to_q", "to_k", "to_v"):
                lin(f"{prefix}.{n}", c, c)
            lin(f"{prefix}.to_out.0", c, c)

        # encoder
        conv("encoder.conv_in", ch[0], 3)
        cin = ch[0]
        for i, c in enumerate(ch):
            for j in range(layers):
                resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
            cin = c
            if i != len(ch) - 1:
                conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
        resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1])
        attn("encoder.mid_block.attentions.0", ch[-1])
        resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
        norm("encoder.conv_norm_out", ch[-1])
        conv("encoder.conv_out", 2 * latent, ch[-1])
        # decoder
        rch = list(reversed(ch))
        conv("decoder.conv_in", rch[0], latent)
        resnet("decoder.mid_block.resnets.0", rch[0], rch[0])
        attn("decoder.mid_block.attentions.0", rch[0])
        resnet("decoder.mid_block.resnets.1", rch[0], rch[0])
        cin = rch[0]
        for i, c in enumerate(rch):
            for j in range(layers + 1):
                resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
            cin = c
            if i != len(rch) - 1:
                conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
        norm("decoder.conv_norm_out", rch[-1])
        conv("decoder.conv_out", 3, rch[-1])
        lin("quant_conv", 2 * latent, 2 * latent)
        sd["quant_conv.weight"] = sd["quant_conv.weight"][..., None, None]  # 1x1 conv form
        lin("post_quant_conv", latent, latent)
        return sd

    def test_structure_matches_init(self, rng_np):
        sd = self._make_diffusers_sd(rng_np)
        params = convert_vae_state_dict(sd, n_blocks=2, layers_per_block=1)
        vae = tiny_vae()
        variables = vae.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3, 16, 16)))
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
        got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
        assert ref_shapes == got_shapes

    def test_cli_roundtrip(self, rng_np, tmp_path, monkeypatch):
        """`python -m latte_tpu.tools.convert_vae DIR DST`: diffusers-dir
        discovery -> safetensors load -> orbax write must reproduce the
        direct conversion exactly."""
        from safetensors.numpy import save_file

        from latte_tpu.tools.convert_vae import cli

        sd = self._make_diffusers_sd(rng_np)
        save_file(
            {k: np.asarray(v, np.float32) for k, v in sd.items()},
            str(tmp_path / "diffusion_pytorch_model.safetensors"),
        )
        dst = tmp_path / "vae_orbax"
        monkeypatch.setattr(
            "sys.argv",
            ["convert_vae", str(tmp_path), str(dst),
             "--n-blocks", "2", "--layers-per-block", "1"],
        )
        cli()
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(str(dst))
        direct = convert_vae_state_dict(sd, n_blocks=2, layers_per_block=1)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(restored))
        flat_d = jax.tree_util.tree_leaves_with_path(direct)
        assert len(flat_r) == len(flat_d)
        for path, leaf in flat_d:
            np.testing.assert_allclose(np.asarray(flat_r[path]), np.asarray(leaf))

    def test_converted_runs(self, rng_np):
        sd = self._make_diffusers_sd(rng_np)
        params = convert_vae_state_dict(sd, n_blocks=2, layers_per_block=1)
        vae = tiny_vae()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16)) * 0.1
        recon, post = vae.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            x,
            rng=jax.random.PRNGKey(2),
        )
        assert recon.shape == x.shape
        assert np.isfinite(np.asarray(recon)).all()


class TestFullGraphTorchParity:
    """Full encoder/decoder graph vs the independent torch AutoencoderKL
    (tests/vae_oracle.py) at random weights — the I3D treatment for the
    component every train step and FVD number flows through
    (/root/reference/train.py:94,210, sample/sample.py:114)."""

    def _build(self, ch, layers, groups, seed):
        import torch

        from latte_tpu.vae import AutoencoderKL
        from tests.vae_oracle import TorchAutoencoderKL, randomize_

        tvae = TorchAutoencoderKL(ch=ch, layers=layers, latent=4, groups=groups)
        tvae.eval()
        randomize_(tvae, seed=seed)
        params = convert_vae_state_dict(
            tvae.state_dict(), n_blocks=len(ch), layers_per_block=layers
        )
        fvae = AutoencoderKL(
            block_out_channels=ch, layers_per_block=layers, groups=groups
        )
        return tvae, fvae, {"params": jax.tree_util.tree_map(jnp.asarray, params)}

    def _check(self, ours, ref):
        ours = np.asarray(ours, np.float32)
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3, rtol=0)

    def test_encode_full_graph(self, rng_np):
        import torch

        tvae, fvae, variables = self._build((8, 16), 1, 4, seed=0)
        x = rng_np.standard_normal((2, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref = tvae.encode_moments(torch.from_numpy(x)).numpy()
        post = fvae.apply(variables, jnp.asarray(x), method=fvae.encode)
        ref_mean, ref_logvar = np.split(ref, 2, axis=1)
        self._check(post.mean, ref_mean)
        self._check(post.logvar, np.clip(ref_logvar, -30.0, 20.0))

    def test_decode_full_graph(self, rng_np):
        import torch

        tvae, fvae, variables = self._build((8, 16), 1, 4, seed=1)
        z = rng_np.standard_normal((2, 4, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tvae.decode(torch.from_numpy(z)).numpy()
        ours = fvae.apply(variables, jnp.asarray(z), method=fvae.decode)
        self._check(ours, ref)

    def test_roundtrip_three_blocks(self, rng_np):
        """Deeper config: two downsamples, conv_shortcut channel changes,
        layers_per_block=2 — the SD-shape block pattern."""
        import torch

        tvae, fvae, variables = self._build((4, 8, 8), 2, 4, seed=2)
        x = rng_np.standard_normal((1, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            mom = tvae.encode_moments(torch.from_numpy(x))
            zt = mom.chunk(2, dim=1)[0]  # mode
            ref = tvae.decode(zt).numpy()
        post = fvae.apply(variables, jnp.asarray(x), method=fvae.encode)
        ours = fvae.apply(variables, post.mode(), method=fvae.decode)
        assert post.mean.shape == (1, 4, 4, 4)  # 16 / 2**2
        self._check(ours, ref)
