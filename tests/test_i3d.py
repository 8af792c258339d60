"""Flax I3D (FVD detector) vs an independently-written torch I3D graph.

The torch implementation below is written directly from the I3D paper
layout (TF-SAME Conv3d+BN+ReLU units, four-branch inception modules,
VALID (2,7,7) avg-pool logits head) using torch's own conv/pad/pool
kernels — an independent realization of the same math, so agreement at
random weights validates the Flax graph structure, the TF-SAME padding
semantics, the eval-mode BN algebra, and the state_dict converter's
kernel transposition all at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF
from torch import nn as tnn

from latte_tpu.eval.i3d import (
    InceptionI3d,
    convert_i3d_state_dict,
    i3d_flax_detector,
)


def _pad_same(x, kernel, stride):
    """TF-SAME padding for 5D (B, C, T, H, W) tensors."""
    pads = []
    for dim, k, s in zip(x.shape[2:], kernel, stride):
        rem = dim % s
        p = max(k - (rem if rem else s), 0)
        pads.append((p // 2, p - p // 2))
    (tf, tb), (hf, hb), (wf, wb) = pads
    return tF.pad(x, (wf, wb, hf, hb, tf, tb))


class TUnit3D(tnn.Module):
    def __init__(self, cin, cout, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, activation=True, use_bias=False):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = tnn.Conv3d(cin, cout, kernel, stride, bias=use_bias)
        self.bn = tnn.BatchNorm3d(cout, eps=1e-3) if use_bn else None
        self.activation = activation

    def forward(self, x):
        x = self.conv3d(_pad_same(x, self.kernel, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return tF.relu(x) if self.activation else x


class TMaxPoolSame(tnn.Module):
    def __init__(self, kernel, stride):
        super().__init__()
        self.kernel, self.stride = kernel, stride

    def forward(self, x):
        return tF.max_pool3d(
            _pad_same(x, self.kernel, self.stride), self.kernel, self.stride
        )


class TInception(tnn.Module):
    def __init__(self, cin, out):
        super().__init__()
        self.b0 = TUnit3D(cin, out[0])
        self.b1a = TUnit3D(cin, out[1])
        self.b1b = TUnit3D(out[1], out[2], kernel=(3, 3, 3))
        self.b2a = TUnit3D(cin, out[3])
        self.b2b = TUnit3D(out[3], out[4], kernel=(3, 3, 3))
        self.pool = TMaxPoolSame((3, 3, 3), (1, 1, 1))
        self.b3b = TUnit3D(cin, out[5])

    def forward(self, x):
        return torch.cat(
            [
                self.b0(x),
                self.b1b(self.b1a(x)),
                self.b2b(self.b2a(x)),
                self.b3b(self.pool(x)),
            ],
            dim=1,
        )


class TI3D(tnn.Module):
    SPECS = {
        "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
        "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
        "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
        "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
        "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
        "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
        "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
        "Mixed_5b": (832, [256, 160, 320, 32, 128, 128]),
        "Mixed_5c": (832, [384, 192, 384, 48, 128, 128]),
    }

    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, kernel=(7, 7, 7), stride=(2, 2, 2))
        self.pool_2a = TMaxPoolSame((1, 3, 3), (1, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, kernel=(3, 3, 3))
        self.pool_3a = TMaxPoolSame((1, 3, 3), (1, 2, 2))
        for name, (cin, out) in self.SPECS.items():
            setattr(self, name, TInception(cin, out))
        self.pool_4a = TMaxPoolSame((3, 3, 3), (2, 2, 2))
        self.pool_5a = TMaxPoolSame((2, 2, 2), (2, 2, 2))
        self.logits = TUnit3D(
            1024, num_classes, use_bn=False, activation=False, use_bias=True
        )

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = self.pool_2a(x)
        x = self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x))
        x = self.pool_3a(x)
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = self.pool_4a(x)
        for ep in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = getattr(self, ep)(x)
        x = self.pool_5a(x)
        x = self.Mixed_5c(self.Mixed_5b(x))
        x = tF.avg_pool3d(x, (2, 7, 7), stride=(1, 1, 1))
        x = self.logits(x)
        return x.mean(dim=(2, 3, 4))


def _random_torch_i3d(seed=0):
    torch.manual_seed(seed)
    m = TI3D().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.Conv3d):
                # variance-preserving init: torch's default attenuates ~3x
                # per layer, collapsing the 22-layer net's output to a
                # constant (FVD between ANY two video sets ~1e-11)
                tnn.init.kaiming_normal_(mod.weight, nonlinearity="relu")
            if isinstance(mod, tnn.BatchNorm3d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.uniform_(-0.1, 0.1)
    return m


@pytest.mark.slow
def test_flax_i3d_matches_independent_torch_graph():
    tm = _random_torch_i3d()
    # the torch module tree above yields pytorch-i3d-style keys for every
    # Unit3D ({endpoint}.conv3d.*, {endpoint}.bn.*, Mixed_*.b1a.conv3d.*)
    params = convert_i3d_state_dict(tm.state_dict())
    fm = InceptionI3d()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 3, 16, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = np.asarray(
        jax.jit(lambda p, v: fm.apply({"params": p}, v))(
            params, jnp.asarray(x.transpose(0, 2, 3, 4, 1))
        )
    )
    assert out.shape == (1, 400)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_flax_detector_call_convention():
    tm = _random_torch_i3d(seed=1)
    params = convert_i3d_state_dict(tm.state_dict())
    det = i3d_flax_detector(params, batch_size=2)

    # uint8-range input with rescale+resize (the FVD protocol call), odd
    # batch size to exercise padding
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (3, 3, 16, 64, 64)).astype(np.float32)
    feats = det(x, rescale=True, resize=True, return_features=True)
    assert feats.shape == (3, 400) and np.isfinite(feats).all()
    # rescale+resize must match torch semantics end-to-end
    with torch.no_grad():
        xt = torch.from_numpy(x) * (2.0 / 255.0) - 1.0
        xt = tF.interpolate(  # per-frame bilinear, half-pixel centers
            xt.permute(0, 2, 1, 3, 4).reshape(-1, 3, 64, 64),
            size=(224, 224), mode="bilinear", align_corners=False,
        )
        xt = xt.reshape(3, 16, 3, 224, 224).permute(0, 2, 1, 3, 4)
        ref = tm(xt).numpy()
    np.testing.assert_allclose(feats, ref, rtol=5e-3, atol=5e-3)
    probs = det(x, rescale=True, resize=True, return_features=False)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_fvd_flax_backend_matches_torch_graph(tmp_path):
    """Full fvd2048_16f protocol chain with the Flax I3D injected as the
    detector equals the same chain run through the torch graph (shared
    random weights) — the on-device eval path computes the same FVD."""
    import os

    from latte_tpu.eval.metrics import calc_metric
    from latte_tpu.utils import save_video

    # the fake distribution is brightness-shifted so FVD is well away from
    # zero — with noise-vs-noise both backends agree only at ~1e-12 scale
    # where the comparison is vacuous
    for d, seed, shift in (("real", 0, 0.0), ("fake", 7, 120.0)):
        os.makedirs(tmp_path / d)
        r = np.random.default_rng(seed)
        for i in range(6):
            v = np.clip(r.random((16, 32, 32, 3)) * 255 + shift, 0, 255).astype(
                np.uint8
            )
            save_video(str(tmp_path / d / f"{i:04d}.mp4"), v)

    tm = _random_torch_i3d(seed=2)
    flax_det = i3d_flax_detector(convert_i3d_state_dict(tm.state_dict()),
                                 batch_size=4)

    def torch_det(x, rescale=False, resize=False, return_features=True):
        with torch.no_grad():
            xt = torch.from_numpy(np.ascontiguousarray(x))
            if rescale:
                xt = xt * (2.0 / 255.0) - 1.0
            if resize:
                b, c, f, h, w = xt.shape
                xt = tF.interpolate(
                    xt.permute(0, 2, 1, 3, 4).reshape(-1, c, h, w),
                    size=(224, 224), mode="bilinear", align_corners=False,
                ).reshape(b, f, c, 224, 224).permute(0, 2, 1, 3, 4)
            return tm(xt).numpy()

    common = dict(real_path=str(tmp_path / "real"), fake_path=str(tmp_path / "fake"),
                  max_real=6, max_fake=6, num_frames=16)
    v_flax = calc_metric("fvd2048_16f", detector=flax_det, **common)["results"][
        "fvd2048_16f"]
    v_torch = calc_metric("fvd2048_16f", detector=torch_det, **common)["results"][
        "fvd2048_16f"]
    assert np.isfinite(v_flax) and v_flax > 1e-6, v_flax
    np.testing.assert_allclose(v_flax, v_torch, rtol=0.02, atol=1e-9)
