"""C3D-UCF101 in Flax — the video-Inception-Score detector.

The reference computes video IS with an auto-downloaded torchscript C3D
(`/root/reference/tools/metrics/video_inception_score.py:14-24`), a
"perfectly reproduced torchscript version" of tgan2's chainer
``C3DVersion1UCF101`` — itself the standard C3D graph (Tran et al. 2015,
"Learning Spatiotemporal Features with 3D Convolutional Networks") fine-
tuned on UCF-101:

    conv1a(3→64)   ─ relu ─ pool1 (1,2,2)
    conv2a(64→128) ─ relu ─ pool2 (2,2,2)
    conv3a(128→256) conv3b(256→256) ─ relu each ─ pool3 (2,2,2)
    conv4a(256→512) conv4b(512→512) ─ relu each ─ pool4 (2,2,2)
    conv5a(512→512) conv5b(512→512) ─ relu each ─ pool5 (2,2,2, spatial pad 1)
    fc6 (8192→4096) relu · fc7 (4096→4096) relu · fc8 (4096→101) · softmax

All convs are 3×3×3 stride 1 pad 1. Input is a 16-frame 112×112 clip; the
asymmetric pool1 keeps the temporal extent, pool5's spatial pad makes the
flattened fc6 input 512·1·4·4 = 8192 (the published fc6 width).

This module mirrors the I3D/Inception treatment (`eval/i3d.py`,
`eval/inception.py`): a native Flax graph so feature extraction runs
on-TPU under jit, a converter from a torch ``state_dict`` (eager or
``torch.jit.load(...).state_dict()``), and a numpy-in/numpy-out detector
callable pluggable as ``opts["detector"]`` in :mod:`latte_tpu.eval.metrics`.
Graph parity is tested at random weights against an independently-written
torch C3D (``tests/test_c3d.py``).

Preprocessing contract (documented, not verifiable bit-exactly without the
egress-blocked torchscript): input (B, C=RGB, F, H, W) float in [0, 255];
frames are bilinearly resized to 112×112 and normalized by the published
Sports-1M channel means (BGR [90.25, 97.66, 101.41] → RGB order here), the
normalization the chainer → torchscript conversion bakes in. When a real
``c3d_ucf101.pt`` is available its exact mean tensor (state_dict key
``mean``, if exported) takes precedence in :func:`convert_c3d_state_dict`.
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Sports-1M pixel means (caffe BGR order 90.25/97.66/101.41) in RGB
_C3D_MEAN_RGB = (101.41, 97.66, 90.25)


class C3D(nn.Module):
    """C3D-UCF101; input (B, F, 112, 112, 3), mean-subtracted; output
    (B, 101) logits (softmax applied by the detector wrapper)."""

    num_classes: int = 101

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, name: nn.Conv(
            f, kernel_size=(3, 3, 3), padding=1, name=name
        )

        def pool(h, window: Tuple[int, int, int], pad_spatial: bool = False):
            padding = (
                [(0, 0), (1, 1), (1, 1)] if pad_spatial else "VALID"
            )
            return nn.max_pool(h, window_shape=window, strides=window, padding=padding)

        x = nn.relu(conv(64, "conv1a")(x))
        x = pool(x, (1, 2, 2))
        x = nn.relu(conv(128, "conv2a")(x))
        x = pool(x, (2, 2, 2))
        x = nn.relu(conv(256, "conv3a")(x))
        x = nn.relu(conv(256, "conv3b")(x))
        x = pool(x, (2, 2, 2))
        x = nn.relu(conv(512, "conv4a")(x))
        x = nn.relu(conv(512, "conv4b")(x))
        x = pool(x, (2, 2, 2))
        x = nn.relu(conv(512, "conv5a")(x))
        x = nn.relu(conv(512, "conv5b")(x))
        x = pool(x, (2, 2, 2), pad_spatial=True)  # (B, 1, 4, 4, 512)
        # flatten in the torch (C, T, H, W) order so converted fc6 weights
        # contract correctly: (B, T, H, W, C) -> (B, C, T, H, W) -> flat
        B = x.shape[0]
        x = x.transpose(0, 4, 1, 2, 3).reshape(B, -1)
        x = nn.relu(nn.Dense(4096, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, name="fc7")(x))
        return nn.Dense(self.num_classes, name="fc8")(x)


def convert_c3d_state_dict(sd) -> Tuple[dict, np.ndarray]:
    """Torch C3D ``state_dict`` → (Flax params, mean image).

    Accepts ``conv1a.weight`` / ``fc6.weight`` naming (tolerating a
    ``module.``/``model.``/``net.`` prefix). Conv kernels transpose
    O,I,kT,kH,kW → kT,kH,kW,I,O; fc weights transpose (out, in) → (in, out).
    Returns the detector mean as a (3,) RGB vector or a full mean tensor
    when the checkpoint exports one (key ``mean``).
    """

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    flat = {}
    for k, v in sd.items():
        for pre in ("module.", "model.", "net.", "c3d."):
            if k.startswith(pre):
                k = k[len(pre):]
        flat[k] = to_np(v)

    params: dict = {}
    mean = np.asarray(_C3D_MEAN_RGB, np.float32)
    for k, v in flat.items():
        if k == "mean":
            mean = v.astype(np.float32)
            continue
        name, leaf = k.rsplit(".", 1)
        if name.startswith("conv"):
            if leaf == "weight":
                params.setdefault(name, {})["kernel"] = jnp.asarray(
                    v.transpose(2, 3, 4, 1, 0)
                )
            elif leaf == "bias":
                params.setdefault(name, {})["bias"] = jnp.asarray(v)
        elif name.startswith("fc"):
            if leaf == "weight":
                params.setdefault(name, {})["kernel"] = jnp.asarray(v.T)
            elif leaf == "bias":
                params.setdefault(name, {})["bias"] = jnp.asarray(v)
    return params, mean


def c3d_flax_detector(
    params: dict, mean: np.ndarray | None = None, batch_size: int = 16
) -> Callable:
    """numpy-in/numpy-out C3D detector running on-device.

    Call convention matches `latte_tpu/eval/detectors.py:c3d_probs`:
    input (B, C, F, H, W) float in [0, 255]; returns softmax class
    probabilities (B, 101). Frames resize to 112×112, the mean image is
    subtracted. Batches pad to ``batch_size`` so one compiled program
    serves the whole protocol.
    """
    model = C3D()
    mean = np.asarray(
        _C3D_MEAN_RGB if mean is None else mean, np.float32
    )
    if mean.ndim == 1:  # channel means -> broadcastable over (B,F,H,W,C)
        mean_arr = jnp.asarray(mean.reshape(1, 1, 1, 1, 3))
    else:  # full mean tensor (C, F, H, W) in torch order
        mean_arr = jnp.asarray(mean.transpose(1, 2, 3, 0)[None])

    @jax.jit
    def forward(p, x):
        b, f = x.shape[0], x.shape[1]
        x = jax.image.resize(x, (b, f, 112, 112, x.shape[-1]), method="bilinear")
        x = x - mean_arr
        logits = model.apply({"params": p}, x)
        return jax.nn.softmax(logits, axis=-1)

    def run(x: np.ndarray, **kwargs) -> np.ndarray:
        x = np.asarray(x, np.float32).transpose(0, 2, 3, 4, 1)  # BCFHW→BFHWC
        outs = []
        for i in range(0, x.shape[0], batch_size):
            chunk = x[i : i + batch_size]
            n = chunk.shape[0]
            if n < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n, *chunk.shape[1:]), np.float32)]
                )
            probs = np.asarray(forward(params, chunk))
            outs.append(probs[:n])
        return np.concatenate(outs, axis=0).astype(np.float32)

    return run
