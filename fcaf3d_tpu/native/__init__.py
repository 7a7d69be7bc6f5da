"""Native (C++) host-side kernels, built on demand with the system g++.

The reference ships native evaluation ops (`iou3d_cuda`, built by
`setup.py`); here the host-side equivalents compile lazily into
`_build/libfcaf3d_native.so` (cached by source mtime) and bind through
ctypes. Everything has a numpy fallback — `FCAF3D_NATIVE=0` disables the
native path entirely, and any build/load failure degrades silently to
numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "iou3d.cc")
_SO = os.path.join(_DIR, "_build", "libfcaf3d_native.so")

_lib = None
_lib_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, or None (disabled / no compiler / build failed)."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if os.environ.get("FCAF3D_NATIVE", "1") == "0":
        return None
    try:
        fresh = os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        if not fresh and not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.iou3d_pairwise.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.iou3d_pairwise.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def pairwise_iou_3d(boxes1: np.ndarray, boxes2: np.ndarray) -> Optional[np.ndarray]:
    """[N, M] rotated 3D IoU of bottom-centered box7 arrays via the native
    kernel; None if the native library is unavailable (caller falls back
    to the numpy path)."""
    lib = load()
    if lib is None:
        return None
    b1 = np.ascontiguousarray(boxes1, np.float32).reshape(-1, 7)
    b2 = np.ascontiguousarray(boxes2, np.float32).reshape(-1, 7)
    out = np.empty((len(b1), len(b2)), np.float32)
    if out.size:
        lib.iou3d_pairwise(
            b1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(b1),
            b2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(b2),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    return out
