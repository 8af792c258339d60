"""Flax FID-InceptionV3 vs an independently-written torch graph.

Same method as ``tests/test_i3d.py``: the torch network below realizes the
pytorch-fid InceptionV3 spec (TF-matching pooling quirks included) with
torch's own conv/pool kernels; agreement at random weights validates the
Flax graph, the padding/pooling semantics (incl. count_include_pad=False
average pools and the Mixed_7c max-pool branch), the eval-mode BN algebra,
and the converter's kernel transposition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF
from torch import nn as tnn

from latte_tpu.eval.inception import (
    FIDInceptionV3,
    convert_inception_state_dict,
    inception_flax_detector,
)


class TConvBN(tnn.Module):
    def __init__(self, cin, cout, kernel=1, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, kernel, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def _avg3(x):
    return tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TMixedA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TConvBN(cin, 64)
        self.branch5x5_1 = TConvBN(cin, 48)
        self.branch5x5_2 = TConvBN(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = TConvBN(cin, 64)
        self.branch3x3dbl_2 = TConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TConvBN(96, 96, 3, padding=1)
        self.branch_pool = TConvBN(cin, pool_features)

    def forward(self, x):
        return torch.cat(
            [
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(_avg3(x)),
            ],
            1,
        )


class TMixedB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TConvBN(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = TConvBN(cin, 64)
        self.branch3x3dbl_2 = TConvBN(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TConvBN(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                tF.max_pool2d(x, 3, stride=2),
            ],
            1,
        )


class TMixedC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TConvBN(cin, 192)
        self.branch7x7_1 = TConvBN(cin, c7)
        self.branch7x7_2 = TConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = TConvBN(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TConvBN(cin, c7)
        self.branch7x7dbl_2 = TConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TConvBN(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TConvBN(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TConvBN(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = TConvBN(cin, 192)

    def forward(self, x):
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        return torch.cat(
            [
                self.branch1x1(x),
                self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
                bd,
                self.branch_pool(_avg3(x)),
            ],
            1,
        )


class TMixedD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TConvBN(cin, 192)
        self.branch3x3_2 = TConvBN(192, 320, 3, stride=2)
        self.branch7x7x3_1 = TConvBN(cin, 192)
        self.branch7x7x3_2 = TConvBN(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TConvBN(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TConvBN(192, 192, 3, stride=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(
                    self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
                ),
                tF.max_pool2d(x, 3, stride=2),
            ],
            1,
        )


class TMixedE(tnn.Module):
    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TConvBN(cin, 320)
        self.branch3x3_1 = TConvBN(cin, 384)
        self.branch3x3_2a = TConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = TConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TConvBN(cin, 448)
        self.branch3x3dbl_2 = TConvBN(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = TConvBN(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TConvBN(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = TConvBN(cin, 192)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            bp = tF.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg3(x)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TInception(tnn.Module):
    def __init__(self, num_logits=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = TConvBN(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = TConvBN(32, 32, 3)
        self.Conv2d_2b_3x3 = TConvBN(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = TConvBN(64, 80)
        self.Conv2d_4a_3x3 = TConvBN(80, 192, 3)
        self.Mixed_5b = TMixedA(192, 32)
        self.Mixed_5c = TMixedA(256, 64)
        self.Mixed_5d = TMixedA(288, 64)
        self.Mixed_6a = TMixedB(288)
        self.Mixed_6b = TMixedC(768, 128)
        self.Mixed_6c = TMixedC(768, 160)
        self.Mixed_6d = TMixedC(768, 160)
        self.Mixed_6e = TMixedC(768, 192)
        self.Mixed_7a = TMixedD(768)
        self.Mixed_7b = TMixedE(1280, "avg")
        self.Mixed_7c = TMixedE(2048, "max")
        self.fc = tnn.Linear(2048, num_logits)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, stride=2)
        for ep in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                   "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                   "Mixed_7c"):
            x = getattr(self, ep)(x)
        pool3 = x.mean(dim=(2, 3))
        return pool3, self.fc(pool3)


def _random_torch_inception(seed=0):
    torch.manual_seed(seed)
    m = TInception().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.Conv2d):
                tnn.init.kaiming_normal_(mod.weight, nonlinearity="relu")
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.uniform_(-0.1, 0.1)
    return m


@pytest.mark.slow
def test_flax_inception_matches_independent_torch_graph():
    tm = _random_torch_inception()
    params = convert_inception_state_dict(tm.state_dict())
    fm = FIDInceptionV3()

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        ref_pool3, ref_logits = (t.numpy() for t in tm(torch.from_numpy(x)))
    pool3, logits, bias = jax.jit(lambda p, v: fm.apply({"params": p}, v))(
        params, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert pool3.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(pool3), ref_pool3, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(logits) + np.asarray(bias), ref_logits, rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_flax_inception_detector_convention():
    tm = _random_torch_inception(seed=1)
    det = inception_flax_detector(convert_inception_state_dict(tm.state_dict()),
                                  batch_size=2)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (3, 3, 64, 64)).astype(np.float32)
    feats = det(x, return_features=True)
    assert feats.shape == (3, 2048) and np.isfinite(feats).all()
    # torch reference with the same preprocessing (rescale + 299 resize)
    with torch.no_grad():
        xt = torch.from_numpy(x) * (2.0 / 255.0) - 1.0
        xt = tF.interpolate(xt, size=(299, 299), mode="bilinear",
                            align_corners=False)
        ref_pool3, ref_logits = (t.numpy() for t in tm(xt))
    np.testing.assert_allclose(feats, ref_pool3, rtol=5e-3, atol=5e-3)
    probs = det(x, no_output_bias=True)
    assert probs.shape == (3, 1008)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    e = np.exp(ref_logits - tm.fc.bias.detach().numpy() -
               (ref_logits - tm.fc.bias.detach().numpy()).max(1, keepdims=True))
    np.testing.assert_allclose(probs, e / e.sum(1, keepdims=True),
                               rtol=5e-3, atol=5e-3)
