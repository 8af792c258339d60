"""InceptionV3 (FID pool3 variant) in Flax — the FID/KID/IS detector.

The reference computes FID/KID/IS with an auto-downloaded Inception-2015
torchscript executed on torch (`/root/reference/tools/metrics/
frechet_inception_distance.py`, ``inception-2015-12-05.pt``). The standard
portable form of those weights is the pytorch-fid layout: torchvision
InceptionV3 module names with the TF-matching pooling quirks (average
pools exclude padding; the last inception block's pool branch is a MAX
pool). This module re-implements that graph natively so image feature
extraction runs on-TPU under jit:

- :class:`FIDInceptionV3` — Flax network, input (B, 299, 299, 3) in
  [-1, 1], output (pool3 2048-d features, 1008-d logits).
- :func:`convert_inception_state_dict` — torchvision/pytorch-fid style
  ``state_dict`` → Flax params.
- :func:`inception_flax_detector` — numpy-in/numpy-out jitted callable
  with the torchscript calling convention (``return_features`` /
  ``no_output_bias`` kwargs), pluggable as ``opts["detector"]``.

Parity with an independently-written torch graph is tested at random
weights (``tests/test_inception.py``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from latte_tpu.eval.i3d import EvalBatchNorm


class ConvBN(nn.Module):
    """Conv2d (no bias) + BN(eps 1e-3) + ReLU; explicit padding tuple."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: object = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        return nn.relu(EvalBatchNorm(name="bn")(x))


def _pad(k):  # symmetric 'same-like' padding used by torchvision's blocks
    return tuple((p, p) for p in k)


def _avg_pool_3x3_excl(x):
    """3x3 stride-1 avg pool, pad 1, count_include_pad=False (pytorch-fid's
    TF-matching quirk): divide by the number of VALID taps, not 9."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    s = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad((1, 1)))
    n = nn.avg_pool(ones, (3, 3), strides=(1, 1), padding=_pad((1, 1)))
    return s / n


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, name="branch1x1")(x)
        b5 = ConvBN(48, name="branch5x5_1")(x)
        b5 = ConvBN(64, kernel=(5, 5), padding=_pad((2, 2)), name="branch5x5_2")(b5)
        b3 = ConvBN(64, name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, kernel=(3, 3), padding=_pad((1, 1)), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, kernel=(3, 3), padding=_pad((1, 1)), name="branch3x3dbl_3")(b3)
        bp = ConvBN(self.pool_features, name="branch_pool")(_avg_pool_3x3_excl(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, kernel=(3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, name="branch3x3dbl_1")(x)
        bd = ConvBN(96, kernel=(3, 3), padding=_pad((1, 1)), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, kernel=(3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, name="branch1x1")(x)
        b7 = ConvBN(c7, name="branch7x7_1")(x)
        b7 = ConvBN(c7, kernel=(1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = ConvBN(192, kernel=(7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = ConvBN(c7, name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, kernel=(7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, kernel=(1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, kernel=(7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, kernel=(1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = ConvBN(192, name="branch_pool")(_avg_pool_3x3_excl(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, name="branch3x3_1")(x)
        b3 = ConvBN(320, kernel=(3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, name="branch7x7x3_1")(x)
        b7 = ConvBN(192, kernel=(1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, kernel=(7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, kernel=(3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid quirk: Mixed_7b pools with the padding-excluding AVG,
    # Mixed_7c (the block feeding pool3) pools with MAX
    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, name="branch1x1")(x)
        b3 = ConvBN(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                ConvBN(384, kernel=(1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3),
                ConvBN(384, kernel=(3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = ConvBN(448, name="branch3x3dbl_1")(x)
        bd = ConvBN(384, kernel=(3, 3), padding=_pad((1, 1)), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                ConvBN(384, kernel=(1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd),
                ConvBN(384, kernel=(3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=_pad((1, 1)))
        else:
            bp = _avg_pool_3x3_excl(x)
        bp = ConvBN(192, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Input (B, 299, 299, 3) in [-1, 1] → (pool3 (B, 2048), logits (B, n)).

    ``num_logits=1008``: the 2015 graph's 1008-way softmax (the IS
    protocol uses these logits with ``no_output_bias=True``,
    reference `inception_score.py:21`).
    """

    num_logits: int = 1008

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, kernel=(3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, kernel=(3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, kernel=(3, 3), padding=_pad((1, 1)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = ConvBN(80, name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, kernel=(3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool_mode="avg", name="Mixed_7b")(x)
        x = InceptionE(pool_mode="max", name="Mixed_7c")(x)
        pool3 = x.mean(axis=(1, 2))  # global average pool → (B, 2048)
        w = self.param(
            "fc_w", nn.initializers.zeros, (2048, self.num_logits), jnp.float32
        )
        b = self.param("fc_b", nn.initializers.zeros, (self.num_logits,), jnp.float32)
        logits = pool3 @ w  # bias applied (or not) by the caller
        return pool3, logits, b


def convert_inception_state_dict(sd) -> dict:
    """Torchvision/pytorch-fid ``state_dict`` → Flax params.

    Expects keys like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}`` and a final
    ``fc.weight``/``fc.bias``; tolerates a stripped leading module prefix.
    """

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for k, v in sd.items():
        for pre in ("module.", "inception.", "net.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        v = to_np(v)
        parts = k.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(["fc_w"], v.transpose(1, 0))
            else:
                put(["fc_b"], v)
            continue
        leaf = parts[-1]
        mid = parts[:-1]  # e.g. ["Mixed_5b", "branch1x1", "conv"]
        if leaf == "weight" and mid[-1] == "conv":
            put([*mid, "kernel"], v.transpose(2, 3, 1, 0))
        elif mid[-1] == "bn":
            name = {
                "weight": "scale",
                "bias": "bias",
                "running_mean": "mean",
                "running_var": "var",
            }.get(leaf)
            if name is not None:
                put([*mid, name], v)
    return params


def inception_flax_detector(params: dict, batch_size: int = 32) -> Callable:
    """numpy-in/numpy-out detector with the torchscript calling convention
    (`latte_tpu/eval/detectors.py:inception_features` / `inception_probs`):
    input (B, C, H, W) uint8-range float, internally resized to 299² and
    scaled to [-1, 1]; ``return_features=True`` → pool3 (B, 2048);
    otherwise softmax probabilities (``no_output_bias=True`` drops the
    output-layer bias — the IS protocol's variant)."""
    model = FIDInceptionV3()

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def forward(p, x, use_bias):
        x = x * (2.0 / 255.0) - 1.0
        b = x.shape[0]
        x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), method="bilinear")
        pool3, logits, bias = model.apply({"params": p}, x)
        logits = jnp.where(use_bias, logits + bias, logits)
        return pool3, jax.nn.softmax(logits, axis=-1)

    def run(x: np.ndarray, return_features=False, no_output_bias=False, **kw):
        x = np.asarray(x, np.float32).transpose(0, 2, 3, 1)  # BCHW → BHWC
        feats, probs = [], []
        for i in range(0, x.shape[0], batch_size):
            chunk = x[i : i + batch_size]
            n = chunk.shape[0]
            if n < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n, *chunk.shape[1:]), np.float32)]
                )
            f, pr = forward(params, chunk, not no_output_bias)
            feats.append(np.asarray(f)[:n])
            probs.append(np.asarray(pr)[:n])
        if return_features:
            return np.concatenate(feats, axis=0).astype(np.float32)
        return np.concatenate(probs, axis=0).astype(np.float32)

    return run
