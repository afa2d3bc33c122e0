"""ctypes binding for the native host-side FPS (``native/fps.cpp``).

Deterministic-mode drop-in for :func:`pcdiff.geometry.fps.farthest_point_sample`
on host data-prep paths (MVP precache, downsample CLI), where shipping every
chunk to the accelerator is wasteful. Falls back to None when the shared
library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["native_fps_indices", "native_available"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libfps.so",
)
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fps_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fps_batch.restype = None
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_fps_indices(
    points: np.ndarray,
    num_samples: int,
    starts: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Deterministic FPS indices [B, M] for points [B, N, C], or None if the
    native library is unavailable. Index-exact with the JAX kernel's
    ``deterministic=True`` mode (default start = b % N, first-argmax ties);
    pass ``starts`` to reproduce chunked-call start patterns."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    B, N, C = pts.shape
    if starts is None:
        starts = np.arange(B, dtype=np.int32) % N
    starts = np.ascontiguousarray(starts, dtype=np.int32)
    out = np.empty((B, num_samples), dtype=np.int32)
    lib.fps_batch(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B, N, C, num_samples,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
