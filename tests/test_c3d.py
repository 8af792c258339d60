"""Flax C3D (video-IS detector) vs an independently-written torch C3D.

Same methodology as tests/test_i3d.py: the torch network below is written
directly from the published C3D layout (Tran et al. 2015; tgan2's
C3DVersion1UCF101, the graph behind the reference's `c3d_ucf101.pt`
torchscript — `/root/reference/tools/metrics/video_inception_score.py:14-24`)
using torch's own conv/pool kernels. Agreement at random weights validates
the Flax graph structure, the asymmetric pool1 / spatially-padded pool5
semantics, the (C, T, H, W) fc6 flatten order, and the state_dict
converter's kernel transpositions all at once.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF
from torch import nn as tnn

from latte_tpu.eval.c3d import C3D, c3d_flax_detector, convert_c3d_state_dict


class TorchC3D(tnn.Module):
    """Independent torch realization of C3D-UCF101."""

    def __init__(self, num_classes=101):
        super().__init__()
        c = lambda i, o: tnn.Conv3d(i, o, 3, 1, 1)
        self.conv1a = c(3, 64)
        self.conv2a = c(64, 128)
        self.conv3a = c(128, 256)
        self.conv3b = c(256, 256)
        self.conv4a = c(256, 512)
        self.conv4b = c(512, 512)
        self.conv5a = c(512, 512)
        self.conv5b = c(512, 512)
        self.fc6 = tnn.Linear(8192, 4096)
        self.fc7 = tnn.Linear(4096, 4096)
        self.fc8 = tnn.Linear(4096, num_classes)

    def forward(self, x):  # (B, 3, 16, 112, 112)
        h = tF.relu(self.conv1a(x))
        h = tF.max_pool3d(h, (1, 2, 2), (1, 2, 2))
        h = tF.relu(self.conv2a(h))
        h = tF.max_pool3d(h, 2, 2)
        h = tF.relu(self.conv3b(tF.relu(self.conv3a(h))))
        h = tF.max_pool3d(h, 2, 2)
        h = tF.relu(self.conv4b(tF.relu(self.conv4a(h))))
        h = tF.max_pool3d(h, 2, 2)
        h = tF.relu(self.conv5b(tF.relu(self.conv5a(h))))
        h = tF.max_pool3d(h, 2, 2, padding=(0, 1, 1))  # -> (B, 512, 1, 4, 4)
        h = h.flatten(1)  # (C, T, H, W) order
        h = tF.relu(self.fc6(h))
        h = tF.relu(self.fc7(h))
        return self.fc8(h)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = TorchC3D().eval()
    # random weights are centered at 0; scale down so relu cascades keep
    # values in a comparable range across 8 conv layers
    with torch.no_grad():
        for p in tmodel.parameters():
            p.mul_(0.05)
    params, mean = convert_c3d_state_dict(tmodel.state_dict())
    return tmodel, params, mean


def test_c3d_graph_parity_random_weights(pair, rng_np):
    """Full-graph logits parity at 112² (no resize in play)."""
    import jax.numpy as jnp

    tmodel, params, _ = pair
    x = rng_np.standard_normal((2, 3, 16, 112, 112)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        C3D().apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    )
    assert ours.shape == ref.shape == (2, 101)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_c3d_detector_call_convention(pair, rng_np):
    """The detector wrapper: (B, C, F, H, W) 0..255 in, softmax probs out,
    batch padding transparent."""
    tmodel, params, mean = pair
    det = c3d_flax_detector(params, mean, batch_size=4)
    x = (rng_np.random((3, 3, 16, 64, 64)) * 255).astype(np.float32)
    probs = det(x)
    assert probs.shape == (3, 101)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
    assert (probs >= 0).all()
    # torch oracle with the same documented preprocessing
    xt = torch.from_numpy(x)
    xt = tF.interpolate(
        xt.permute(0, 2, 1, 3, 4).flatten(0, 1), size=(112, 112),
        mode="bilinear", align_corners=False,
    ).unflatten(0, (3, 16)).permute(0, 2, 1, 3, 4)
    m = torch.from_numpy(np.asarray(mean, np.float32)).view(1, 3, 1, 1, 1)
    with torch.no_grad():
        ref = torch.softmax(tmodel(xt - m), dim=1).numpy()
    np.testing.assert_allclose(probs, ref, rtol=2e-3, atol=2e-4)


def test_c3d_converter_rejects_nothing_silently(pair):
    """Converter consumes every conv/fc leaf; a full-mean tensor in the
    checkpoint overrides the default channel means."""
    tmodel, _, _ = pair
    sd = {k: v for k, v in tmodel.state_dict().items()}
    sd["mean"] = torch.zeros(3, 16, 112, 112)
    params, mean = convert_c3d_state_dict(sd)
    assert mean.shape == (3, 16, 112, 112)
    assert set(params) == {
        "conv1a", "conv2a", "conv3a", "conv3b", "conv4a", "conv4b",
        "conv5a", "conv5b", "fc6", "fc7", "fc8",
    }


def test_isv_metric_runs_with_flax_c3d(pair, tmp_path, rng_np):
    """isv2048_ucf end-to-end over a tiny frame dir with the Flax C3D as
    the injected detector (the LATTE_TPU_DETECTOR_BACKEND=flax path)."""
    from PIL import Image

    from latte_tpu.eval.metrics import calc_metric

    tmodel, params, mean = pair
    det = c3d_flax_detector(params, mean, batch_size=2)
    fake = tmp_path / "fake"
    for v in range(10):  # >= num_splits (10): each split needs >= 1 clip
        d = fake / f"{v:03d}"
        d.mkdir(parents=True)
        for i in range(16):
            arr = (rng_np.random((32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:03d}.png")
    out = calc_metric(
        "isv2048_ucf",
        fake_path=str(fake),
        detector=det,
        max_fake=10,
        num_frames=16,
    )["results"]
    assert np.isfinite(out["isv2048_ucf_mean"])
    assert out["isv2048_ucf_mean"] >= 1.0
