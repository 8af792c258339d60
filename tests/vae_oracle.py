"""Independent torch realizations of the SD AutoencoderKL and the SVD
TemporalDecoder graphs, for full-graph parity testing of the Flax VAEs.

Written directly from the architecture (GroupNorm→SiLU→3×3-conv resnets,
single-head mid attention at 1/√C scale, asymmetric-(0,1)-padded stride-2
downsample, nearest-×2 upsample, AlphaBlender spatio-temporal mix) using
torch's own conv/norm/interpolate kernels — an independent realization of
the same math, mirroring the I3D/Inception methodology (tests/test_i3d.py).
Agreement at random weights validates the Flax graph structure, the
padding/resize semantics, and `latte_tpu.tools.convert_vae`'s layout
transposition all at once.

Attribute names are chosen so ``.state_dict()`` emits diffusers-style keys
(``encoder.down_blocks.0.resnets.0.conv1.weight`` …) — the naming the
published checkpoints use — so these modules drive the converters with
realistically-shaped input.

Reference seams: /root/reference/train.py:94,210 (AutoencoderKL encode in
training, ×0.18215), /root/reference/sample/sample.py:114 (decode),
/root/reference/sample/pipeline_latte.py:752-798 (temporal decode, chunk 14).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class TResnet(nn.Module):
    def __init__(self, cin: int, cout: int, groups: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttn(nn.Module):
    """Single-head spatial self-attention over H·W tokens."""

    def __init__(self, c: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) * C**-0.5, dim=-1)
        out = self.to_out[0](attn @ v)
        return x + out.transpose(1, 2).reshape(B, C, H, W)


class TDownsample(nn.Module):
    """SD downsample: (0,1,0,1) pad then stride-2 VALID conv."""

    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUpsample(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Holder(nn.Module):
    """Bare module that only names its children (for diffusers-style keys)."""

    def __init__(self, **children):
        super().__init__()
        for name, mod in children.items():
            setattr(self, name, mod)


class TMidBlock(nn.Module):
    def __init__(self, c: int, groups: int):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(c, c, groups), TResnet(c, c, groups)])
        self.attentions = nn.ModuleList([TAttn(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TEncoder(nn.Module):
    def __init__(self, ch=(8, 16), layers=1, latent=4, groups=4, in_ch=3):
        super().__init__()
        self.conv_in = nn.Conv2d(in_ch, ch[0], 3, padding=1)
        blocks = []
        cin = ch[0]
        for i, c in enumerate(ch):
            resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else c, c, groups) for j in range(layers)]
            )
            downs = (
                nn.ModuleList([TDownsample(c)]) if i != len(ch) - 1 else nn.ModuleList()
            )
            blocks.append(_Holder(resnets=resnets, downsamplers=downs))
            cin = c
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMidBlock(ch[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, ch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(ch[-1], 2 * latent, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                h = r(h)
            for d in blk.downsamplers:
                h = d(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TDecoder(nn.Module):
    def __init__(self, ch=(8, 16), layers=1, latent=4, groups=4, out_ch=3):
        super().__init__()
        rch = list(reversed(ch))
        self.conv_in = nn.Conv2d(latent, rch[0], 3, padding=1)
        self.mid_block = TMidBlock(rch[0], groups)
        blocks = []
        cin = rch[0]
        for i, c in enumerate(rch):
            resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else c, c, groups) for j in range(layers + 1)]
            )
            ups = (
                nn.ModuleList([TUpsample(c)]) if i != len(rch) - 1 else nn.ModuleList()
            )
            blocks.append(_Holder(resnets=resnets, upsamplers=ups))
            cin = c
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(groups, rch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rch[-1], out_ch, 3, padding=1)

    def forward(self, z):
        h = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            for r in blk.resnets:
                h = r(h)
            for u in blk.upsamplers:
                h = u(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchAutoencoderKL(nn.Module):
    """Tiny-configurable independent AutoencoderKL (encode → moments,
    decode → pixels); NCHW like the reference."""

    def __init__(self, ch=(8, 16), layers=1, latent=4, groups=4):
        super().__init__()
        self.encoder = TEncoder(ch, layers, latent, groups)
        self.decoder = TDecoder(ch, layers, latent, groups)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# --- SVD TemporalDecoder ---------------------------------------------------


class TTemporalResnet(nn.Module):
    """Frame-axis resnet: (B, C, F, H, W) with (3,1,1) convs."""

    def __init__(self, cin: int, cout: int, groups: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))
        self.conv_shortcut = nn.Conv3d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TMixer(nn.Module):
    def __init__(self):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.zeros(1))


class TSTResnet(nn.Module):
    """Spatial resnet blended with a temporal resnet by a learned sigmoid
    alpha (switch_spatial_to_temporal_mix semantics):
    out = (1−σ(m))·spatial + σ(m)·temporal."""

    def __init__(self, cin: int, cout: int, groups: int):
        super().__init__()
        self.spatial_res_block = TResnet(cin, cout, groups)
        self.temporal_res_block = TTemporalResnet(cout, cout, groups)
        self.time_mixer = TMixer()

    def forward(self, x, num_frames: int):
        BF, _, H, W = x.shape
        hs = self.spatial_res_block(x)
        C = hs.shape[1]
        B = BF // num_frames
        hv = hs.reshape(B, num_frames, C, H, W).permute(0, 2, 1, 3, 4)
        ht = self.temporal_res_block(hv)
        alpha = torch.sigmoid(self.time_mixer.mix_factor)
        out = (1.0 - alpha) * hv + alpha * ht
        return out.permute(0, 2, 1, 3, 4).reshape(BF, C, H, W)


class TTemporalMid(nn.Module):
    def __init__(self, c: int, groups: int):
        super().__init__()
        self.resnets = nn.ModuleList([TSTResnet(c, c, groups), TSTResnet(c, c, groups)])
        self.attentions = nn.ModuleList([TAttn(c, groups)])

    def forward(self, x, num_frames: int):
        x = self.resnets[0](x, num_frames)
        x = self.attentions[0](x)
        return self.resnets[1](x, num_frames)


class TTemporalDecoder(nn.Module):
    def __init__(self, ch=(8, 16), layers=1, latent=4, groups=4, out_ch=3):
        super().__init__()
        rch = list(reversed(ch))
        self.conv_in = nn.Conv2d(latent, rch[0], 3, padding=1)
        self.mid_block = TTemporalMid(rch[0], groups)
        blocks = []
        cin = rch[0]
        for i, c in enumerate(rch):
            resnets = nn.ModuleList(
                [TSTResnet(cin if j == 0 else c, c, groups) for j in range(layers)]
            )
            ups = (
                nn.ModuleList([TUpsample(c)]) if i != len(rch) - 1 else nn.ModuleList()
            )
            blocks.append(_Holder(resnets=resnets, upsamplers=ups))
            cin = c
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(groups, rch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rch[-1], out_ch, 3, padding=1)
        self.time_conv_out = nn.Conv3d(out_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z, num_frames: int):
        h = self.mid_block(self.conv_in(z), num_frames)
        for blk in self.up_blocks:
            for r in blk.resnets:
                h = r(h, num_frames)
            for u in blk.upsamplers:
                h = u(h)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        BF, C, H, W = h.shape
        B = BF // num_frames
        hv = h.reshape(B, num_frames, C, H, W).permute(0, 2, 1, 3, 4)
        hv = self.time_conv_out(hv)
        return hv.permute(0, 2, 1, 3, 4).reshape(BF, C, H, W)


class TorchTemporalDecoderModel(nn.Module):
    """Wrapper whose state_dict carries the ``decoder.`` prefix, matching the
    diffusers AutoencoderKLTemporalDecoder checkpoint layout."""

    def __init__(self, **kw):
        super().__init__()
        self.decoder = TTemporalDecoder(**kw)

    def forward(self, z, num_frames: int):
        return self.decoder(z, num_frames)


@torch.no_grad()
def randomize_(module: nn.Module, seed: int = 0, scale: float = 0.2) -> None:
    """Fill every parameter with seeded N(0, scale²) — nontrivial values for
    parity tests (default torch init leaves norms at exactly 1/0)."""
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        p.copy_(torch.randn(p.shape, generator=g) * scale)
