"""ctypes bindings for the native frame-preprocessing library.

Loads native/libvgt_frame_ops.so (built by ``make -C native``); builds it on
first use if a compiler is available; falls back to the numpy/cv2 path when
neither works. See native/frame_ops.cpp.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvgt_frame_ops.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vgt_preprocess_batch.restype = ctypes.c_int
        lib.vgt_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch(frames: Sequence[np.ndarray], height: int, width: int,
                     num_threads: int = 0) -> np.ndarray:
    """[n × (H_i, W_i, 3) uint8 RGB] -> [n, height, width, 3] float32 in
    [-1, 1]: fused cover-resize + center-crop + normalise, threaded."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native frame_ops library unavailable")
    n = len(frames)
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    for f in frames:
        if f.ndim != 3 or f.shape[2] != 3:
            raise ValueError(f"frames must be HxWx3 uint8, got {f.shape}")
    srcs = (ctypes.c_void_p * n)(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in frames])
    shs = (ctypes.c_int * n)(*[f.shape[0] for f in frames])
    sws = (ctypes.c_int * n)(*[f.shape[1] for f in frames])
    out = np.empty((n, height, width, 3), np.float32)
    rc = lib.vgt_preprocess_batch(
        ctypes.cast(srcs, ctypes.POINTER(ctypes.c_void_p)), shs, sws, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width, num_threads)
    if rc != 0:
        raise RuntimeError(f"vgt_preprocess_batch failed: rc={rc}")
    return out
