"""ctypes bindings for the native C++ op references (parity oracles).

Auto-builds libtpuops.so on first use (same pattern as pdfio/native).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuops.so")
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "deform_conv_cpu.cc")
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(src) > os.path.getmtime(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.deform_conv2d_cpu.restype = ctypes.c_int
        lib.deform_conv2d_cpu.argtypes = [f32p, f32p, f32p, f32p,
                                          ctypes.c_void_p, f32p] + \
            [ctypes.c_int] * 13
        _lib = lib
        return _lib


def deform_conv2d_cpu(x: np.ndarray, offset: np.ndarray, mask: np.ndarray,
                      weight: np.ndarray, bias=None,
                      stride=(1, 1), padding=(1, 1), dilation=(1, 1)):
    """NHWC modulated deformable conv, C++ reference (see ops/native)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    offset = np.ascontiguousarray(offset, np.float32)
    mask = np.ascontiguousarray(mask, np.float32)
    weight = np.ascontiguousarray(weight, np.float32)
    B, H, W, Cin = x.shape
    Kh, Kw, _, Cout = weight.shape
    Ho = (H + 2 * padding[0] - dilation[0] * (Kh - 1) - 1) // stride[0] + 1
    Wo = (W + 2 * padding[1] - dilation[1] * (Kw - 1) - 1) // stride[1] + 1
    out = np.zeros((B, Ho, Wo, Cout), np.float32)
    bias_ptr = None
    if bias is not None:
        bias = np.ascontiguousarray(bias, np.float32)
        bias_ptr = bias.ctypes.data_as(ctypes.c_void_p)
    rc = lib.deform_conv2d_cpu(
        x, offset, mask, weight, bias_ptr, out,
        B, H, W, Cin, Kh, Kw, Cout,
        stride[0], stride[1], padding[0], padding[1],
        dilation[0], dilation[1])
    assert rc == 0
    return out
