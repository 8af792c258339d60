"""Native (C++) host-side kernels with ctypes bindings.

TPU compute uses the XLA/Pallas implementations in
:mod:`latte_tpu.kernels`; these native libraries serve host-side pipelines
(metrics/layers paths, where the reference used its CUDA plugins) and act
as independent oracles in tests. Everything degrades gracefully to the
pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
from functools import lru_cache
from typing import Optional

import numpy as np

from latte_tpu.native.build import build_library

ACT_INDEX = {
    "linear": 0,
    "relu": 1,
    "lrelu": 2,
    "tanh": 3,
    "sigmoid": 4,
    "elu": 5,
    "selu": 6,
    "softplus": 7,
    "swish": 8,
}

_f32p = ctypes.POINTER(ctypes.c_float)


@lru_cache(None)
def _bias_act_lib():
    lib = build_library("bias_act", ["bias_act.cpp"])
    if lib is None:
        return None
    lib.bias_act_f32.argtypes = [
        _f32p, _f32p, _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.bias_act_grad_f32.argtypes = [
        _f32p, _f32p, _f32p, _f32p, _f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float,
    ]
    return lib


@lru_cache(None)
def _upfirdn_lib():
    lib = build_library("upfirdn2d", ["upfirdn2d.cpp"])
    if lib is None:
        return None
    lib.upfirdn2d_f32.argtypes = [
        _f32p, _f32p, _f32p,
        *([ctypes.c_int64] * 6),
        *([ctypes.c_int] * 8),
        ctypes.c_float,
    ]
    return lib


def native_available() -> bool:
    return _bias_act_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_f32p)


def bias_act_native(
    x: np.ndarray,
    b: Optional[np.ndarray] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: float = 0.2,
    gain: float = 1.0,
    clamp: float = -1.0,
) -> Optional[np.ndarray]:
    lib = _bias_act_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    y = np.empty_like(x)
    c = x.shape[dim] if b is not None else 1
    stride = int(np.prod(x.shape[dim + 1 :])) if b is not None else 1
    bp = _ptr(np.ascontiguousarray(b, np.float32)) if b is not None else _f32p()
    lib.bias_act_f32(
        _ptr(x), bp, _ptr(y), x.size, c, stride, ACT_INDEX[act], alpha, gain, clamp
    )
    return y


def upfirdn2d_native(
    x: np.ndarray,
    f: np.ndarray,
    up=(1, 1),
    down=(1, 1),
    pad=(0, 0, 0, 0),
    gain: float = 1.0,
    flip_filter: bool = False,
) -> Optional[np.ndarray]:
    lib = _upfirdn_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    if not flip_filter:
        # the C++ kernel correlates; the spec's default is true convolution
        f = f[::-1, ::-1]
    f = np.ascontiguousarray(f, np.float32)
    n, c, h, w = x.shape
    fh, fw = f.shape
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = pad
    oh = (h * upy + pady0 + pady1 - fh) // downy + 1
    ow = (w * upx + padx0 + padx1 - fw) // downx + 1
    y = np.empty((n, c, oh, ow), np.float32)
    lib.upfirdn2d_f32(
        _ptr(x), _ptr(f), _ptr(y), n, c, h, w, fh, fw,
        upx, upy, downx, downy, padx0, padx1, pady0, pady1, gain,
    )
    return y
