"""ctypes bindings for the native sim-core raycaster (native/simcore).

Auto-builds libsimcore.so on first use; `available()` gates callers so
the Python renderer in sim/fake_env.py remains the oracle/fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "simcore")
)
_LIB = os.path.join(_DIR, "libsimcore.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB):
            subprocess.run(["make", "-s"], cwd=_DIR, check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.render_views.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.render_views.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def render_views(
    grid: np.ndarray,      # (gh, gw) bool/uint8, True = wall
    cell: float,
    poses: np.ndarray,     # (V, 3): x, z, theta
    size: int,
    cam,                   # CameraMatrix
    wall_height: float,
    camera_height: float,
    max_depth: float,
):
    """Returns (depth (V, size, size) float32, rgb (V, size, size, 3) uint8)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libsimcore unavailable")
    g = np.ascontiguousarray(grid.astype(np.uint8))
    p = np.ascontiguousarray(np.asarray(poses, np.float64))
    v = p.shape[0]
    depth = np.empty((v, size, size), np.float32)
    rgb = np.empty((v, size, size, 3), np.uint8)
    lib.render_views(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        g.shape[0], g.shape[1], float(cell),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), v,
        size, float(cam.xc), float(cam.zc), float(cam.f),
        float(wall_height), float(camera_height), float(max_depth),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return depth, rgb
