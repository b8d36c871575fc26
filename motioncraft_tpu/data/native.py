"""ctypes bindings for the native data-loader kernels (native/*.cpp).

Auto-builds the shared library on first use when a compiler is present;
callers fall back to the numpy implementations when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaudio_features.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        lib.onset_amplitude.restype = ctypes.c_int
        lib.onset_amplitude.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.stride_windows.restype = None
        lib.stride_windows.argtypes = [ctypes.POINTER(ctypes.c_float)] + \
            [ctypes.c_int64] * 5 + [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def onset_amplitude_native(wav: np.ndarray) -> Optional[np.ndarray]:
    """[L] float32 -> [L, 2] via the C++ spectral-flux extractor; None when
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    wav = np.ascontiguousarray(wav, np.float32)
    out = np.empty((len(wav), 2), np.float32)
    ret = lib.onset_amplitude(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if ret < 0:
        return None
    return out


def stride_windows_native(src: np.ndarray, win: int, stride: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    T, D = src.shape
    n = max(0, (T - win) // stride + 1)
    dst = np.empty((n, win, D), np.float32)
    lib.stride_windows(src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       T, D, win, stride, n,
                       dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst
