"""Temporal VAE decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.vae.temporal_decoder import (
    SpatioTemporalResBlock,
    TemporalResnetBlock,
    tiny_temporal_decoder,
)


class TestTemporalDecoder:
    def test_decode_shapes(self):
        dec = tiny_temporal_decoder()
        z = jnp.zeros((8, 4, 4, 4))  # 8 = 2 videos x 4 frames
        v = dec.init({"params": jax.random.PRNGKey(0)}, z, num_frames=4)
        out = dec.apply(v, z, num_frames=4)
        # 2 blocks -> one upsample -> x2
        assert out.shape == (8, 3, 8, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_temporal_mixing_active(self):
        """With mix_factor raised, frame shuffling must change outputs."""
        dec = tiny_temporal_decoder()
        z = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 4))
        v = dec.init({"params": jax.random.PRNGKey(0)}, z, num_frames=4)
        # crank all mix factors to 5 (alpha≈1 -> temporal branch dominates)
        v = jax.tree_util.tree_map(
            lambda a: jnp.full_like(a, 5.0) if a.shape == (1,) else a, v
        )
        out1 = dec.apply(v, z, num_frames=4)
        out2 = dec.apply(v, z[::-1], num_frames=4)
        # frame 0 of reversed input corresponds to frame 3: outputs differ
        # from simply reversing if temporal conv sees different neighbors
        assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[-1]))

    def test_alpha_zero_ignores_temporal_conv1(self):
        """At mix_factor=0 (alpha=.5) both branches contribute."""
        blk = SpatioTemporalResBlock(out_channels=8, groups=4)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 8))
        v = blk.init({"params": jax.random.PRNGKey(0)}, x, num_frames=2)
        out = blk.apply(v, x, num_frames=2)
        assert out.shape == x.shape

    def test_temporal_resnet_frame_axis(self):
        blk = TemporalResnetBlock(out_channels=8, groups=4)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 4, 4, 8))
        v = blk.init({"params": jax.random.PRNGKey(0)}, x)
        out = blk.apply(v, x)
        assert out.shape == x.shape


class TestTemporalDecoderConversion:
    def _make_sd(self, rng, ch=(8, 16), layers=1, latent=4):
        sd = {}

        def conv(prefix, o, i, k=3):
            sd[f"{prefix}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def conv3d(prefix, o, i, kt=3):
            sd[f"{prefix}.weight"] = rng.standard_normal((o, i, kt, 1, 1)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def norm(prefix, c):
            sd[f"{prefix}.weight"] = rng.standard_normal((c,)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal((c,)).astype(np.float32)

        def lin(prefix, o, i):
            sd[f"{prefix}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(np.float32)

        def st_resnet(prefix, cin, cout):
            norm(f"{prefix}.spatial_res_block.norm1", cin)
            conv(f"{prefix}.spatial_res_block.conv1", cout, cin)
            norm(f"{prefix}.spatial_res_block.norm2", cout)
            conv(f"{prefix}.spatial_res_block.conv2", cout, cout)
            if cin != cout:
                conv(f"{prefix}.spatial_res_block.conv_shortcut", cout, cin, k=1)
            norm(f"{prefix}.temporal_res_block.norm1", cout)
            conv3d(f"{prefix}.temporal_res_block.conv1", cout, cout)
            norm(f"{prefix}.temporal_res_block.norm2", cout)
            conv3d(f"{prefix}.temporal_res_block.conv2", cout, cout)
            sd[f"{prefix}.time_mixer.mix_factor"] = np.zeros((1,), np.float32)

        rch = list(reversed(ch))  # (16, 8)
        conv("decoder.conv_in", rch[0], latent)
        st_resnet("decoder.mid_block.resnets.0", rch[0], rch[0])
        norm("decoder.mid_block.attentions.0.group_norm", rch[0])
        for n in ("to_q", "to_k", "to_v"):
            lin(f"decoder.mid_block.attentions.0.{n}", rch[0], rch[0])
        lin("decoder.mid_block.attentions.0.to_out.0", rch[0], rch[0])
        st_resnet("decoder.mid_block.resnets.1", rch[0], rch[0])
        cin = rch[0]
        for i, c in enumerate(rch):
            for j in range(1):
                st_resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
            cin = c
            if i != len(rch) - 1:
                conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
        norm("decoder.conv_norm_out", rch[-1])
        conv("decoder.conv_out", 3, rch[-1])
        conv3d("decoder.time_conv_out", 3, 3)
        return sd

    def test_structure_matches_init(self):
        import numpy as _np

        from latte_tpu.tools.convert_vae import convert_temporal_decoder_state_dict

        rng = _np.random.default_rng(0)
        sd = self._make_sd(rng)
        params = convert_temporal_decoder_state_dict(sd, n_blocks=2, layers_per_block=1)
        dec = tiny_temporal_decoder()
        z = jnp.zeros((4, 4, 4, 4))
        variables = dec.init({"params": jax.random.PRNGKey(0)}, z, num_frames=4)
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
        got_shapes = jax.tree_util.tree_map(lambda a: _np.asarray(a).shape, params)
        assert ref_shapes == got_shapes

    def test_converted_runs(self):
        import numpy as _np

        from latte_tpu.tools.convert_vae import convert_temporal_decoder_state_dict

        rng = _np.random.default_rng(1)
        sd = self._make_sd(rng)
        params = convert_temporal_decoder_state_dict(sd, n_blocks=2, layers_per_block=1)
        dec = tiny_temporal_decoder()
        z = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 4)) * 0.1
        out = dec.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)}, z, num_frames=4
        )
        assert out.shape == (4, 3, 8, 8)
        assert _np.isfinite(_np.asarray(out)).all()


class TestFullGraphTorchParity:
    """Full temporal-decoder graph vs the independent torch realization
    (tests/vae_oracle.py) at random weights — covers the spatio-temporal
    blend, the frame-axis (3,1,1) convs, and time_conv_out
    (/root/reference/sample/pipeline_latte.py:765-798)."""

    def test_temporal_decode_full_graph(self):
        import numpy as _np
        import torch

        from latte_tpu.tools.convert_vae import convert_temporal_decoder_state_dict
        from tests.vae_oracle import TorchTemporalDecoderModel, randomize_

        tdec = TorchTemporalDecoderModel(ch=(8, 16), layers=1, latent=4, groups=4)
        tdec.eval()
        randomize_(tdec, seed=3)  # nonzero mix factors: both branches active
        params = convert_temporal_decoder_state_dict(
            tdec.state_dict(), n_blocks=2, layers_per_block=1
        )
        dec = tiny_temporal_decoder()
        rng = _np.random.default_rng(4)
        z = rng.standard_normal((8, 4, 4, 4)).astype(_np.float32)  # 2 vids x 4f
        with torch.no_grad():
            ref = tdec(torch.from_numpy(z), num_frames=4).numpy()
        ours = _np.asarray(
            dec.apply(
                {"params": jax.tree_util.tree_map(jnp.asarray, params)},
                jnp.asarray(z),
                num_frames=4,
            ),
            _np.float32,
        )
        scale = max(_np.abs(ref).max(), 1.0)
        _np.testing.assert_allclose(ours / scale, ref / scale, atol=1e-3, rtol=0)
        # the blend must actually be temporal: shuffling frames changes pixels
        zs = z.reshape(2, 4, 4, 4, 4)[:, ::-1].reshape(8, 4, 4, 4).copy()
        with torch.no_grad():
            ref_s = tdec(torch.from_numpy(zs), num_frames=4).numpy()
        unshuffled = ref_s.reshape(2, 4, 3, 8, 8)[:, ::-1].reshape(8, 3, 8, 8)
        assert not _np.allclose(unshuffled, ref, atol=1e-5)
