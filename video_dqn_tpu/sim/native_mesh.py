"""ctypes bindings for the native mesh raycaster (native/simcore/mesh.cc).

Auto-builds libsimcore.so on first use. `available()` gates callers; the
numpy brute-force twin in sim/mesh_twin.py is the test oracle and the
fallback when no compiler exists (the repo's standard native pattern,
see ops/fmm.py and sim/native_render.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "simcore")
)
_LIB = os.path.join(_DIR, "libsimcore.so")
_lib = None
_tried = False

_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        need_build = not os.path.exists(_LIB)
        if not need_build:
            # stale lib from before the mesh backend existed
            probe = ctypes.CDLL(_LIB)
            need_build = not hasattr(probe, "mesh_create")
        if need_build:
            subprocess.run(["make", "-s", "-B"], cwd=_DIR, check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.mesh_create.argtypes = [_f32p, ctypes.c_int, _i32p, ctypes.c_int, _u8p]
        lib.mesh_create.restype = ctypes.c_void_p
        lib.mesh_destroy.argtypes = [ctypes.c_void_p]
        lib.mesh_bounds.argtypes = [ctypes.c_void_p, _f32p]
        lib.mesh_render.argtypes = [
            ctypes.c_void_p, _f64p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            _f32p, _u8p,
        ]
        lib.mesh_floor_probe.argtypes = [
            ctypes.c_void_p, _f64p, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, _f32p, _u8p,
        ]
        lib.mesh_raycast.argtypes = [
            ctypes.c_void_p, _f32p, _f32p, ctypes.c_int, _f32p, _i32p,
        ]
        lib.mesh_floor_levels.argtypes = [
            ctypes.c_void_p, _f64p, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            _f32p, _u8p, _i32p,
        ]
        lib.mesh_column_blocked.argtypes = [
            ctypes.c_void_p, _f64p, _f32p, _f32p, ctypes.c_int,
            ctypes.c_double, _u8p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


class NativeMesh:
    """BVH-backed triangle mesh; all queries are batched C calls."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray,
                 colors: Optional[np.ndarray] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("libsimcore (mesh backend) unavailable")
        self._lib = lib
        self._v = np.ascontiguousarray(vertices, np.float32)
        self._f = np.ascontiguousarray(faces, np.int32)
        self._c = (
            np.ascontiguousarray(colors, np.uint8) if colors is not None else None
        )
        self._h = lib.mesh_create(
            self._v.ctypes.data_as(_f32p), len(self._v),
            self._f.ctypes.data_as(_i32p), len(self._f),
            self._c.ctypes.data_as(_u8p) if self._c is not None else None,
        )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mesh_destroy(h)
            self._h = None

    def bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        out = np.empty(6, np.float32)
        self._lib.mesh_bounds(self._h, out.ctypes.data_as(_f32p))
        return out[:3].copy(), out[3:].copy()

    def render(self, poses: np.ndarray, size: int, cam,
               max_depth: float) -> Tuple[np.ndarray, np.ndarray]:
        """poses (V,4): x, y, z, yaw. Returns (depth (V,S,S) f32 z-buffer,
        rgb (V,S,S,3) u8)."""
        p = np.ascontiguousarray(poses, np.float64)
        v = p.shape[0]
        depth = np.empty((v, size, size), np.float32)
        rgb = np.empty((v, size, size, 3), np.uint8)
        self._lib.mesh_render(
            self._h, p.ctypes.data_as(_f64p), v, size,
            float(cam.xc), float(cam.zc), float(cam.f), float(max_depth),
            depth.ctypes.data_as(_f32p), rgb.ctypes.data_as(_u8p),
        )
        return depth, rgb

    def floor_probe(self, xz: np.ndarray, y_from: float, max_drop: float,
                    clearance: float) -> Tuple[np.ndarray, np.ndarray]:
        """xz (N,2). Returns (floor_y (N,) f32 [NaN = no floor],
        ok (N,) bool [floor found, walkable slope, clearance above])."""
        q = np.ascontiguousarray(xz, np.float64)
        n = q.shape[0]
        y = np.empty(n, np.float32)
        ok = np.empty(n, np.uint8)
        self._lib.mesh_floor_probe(
            self._h, q.ctypes.data_as(_f64p), n,
            float(y_from), float(max_drop), float(clearance),
            y.ctypes.data_as(_f32p), ok.ctypes.data_as(_u8p),
        )
        return y, ok.astype(bool)

    def floor_levels(self, xz: np.ndarray, y_from: float, y_min: float,
                     clearance: float, max_levels: int = 8):
        """Peel ALL surfaces under each (x, z) column from y_from down to
        y_min. Returns (y (N, L) f32, ok (N, L) bool, count (N,) i32);
        entries beyond count are undefined."""
        q = np.ascontiguousarray(xz, np.float64)
        n = q.shape[0]
        y = np.empty((n, max_levels), np.float32)
        ok = np.empty((n, max_levels), np.uint8)
        cnt = np.empty(n, np.int32)
        self._lib.mesh_floor_levels(
            self._h, q.ctypes.data_as(_f64p), n,
            float(y_from), float(y_min), float(clearance), int(max_levels),
            y.ctypes.data_as(_f32p), ok.ctypes.data_as(_u8p),
            cnt.ctypes.data_as(_i32p),
        )
        return y, ok.astype(bool), cnt

    def column_blocked(self, xz: np.ndarray, y_lo: np.ndarray,
                       y_hi: np.ndarray, radius: float) -> np.ndarray:
        """True where any triangle intersects the column box
        [x +- radius] x [y_lo, y_hi] x [z +- radius] (exact SAT test)."""
        q = np.ascontiguousarray(xz, np.float64)
        n = q.shape[0]
        lo = np.ascontiguousarray(np.broadcast_to(y_lo, (n,)), np.float32)
        hi = np.ascontiguousarray(np.broadcast_to(y_hi, (n,)), np.float32)
        out = np.empty(n, np.uint8)
        self._lib.mesh_column_blocked(
            self._h, q.ctypes.data_as(_f64p), lo.ctypes.data_as(_f32p),
            hi.ctypes.data_as(_f32p), n, float(radius),
            out.ctypes.data_as(_u8p),
        )
        return out.astype(bool)

    def raycast(self, origins: np.ndarray, dirs: np.ndarray):
        """Returns (t (N,) f32 [+inf = miss], tri (N,) i32 [-1 = miss])."""
        o = np.ascontiguousarray(origins, np.float32)
        d = np.ascontiguousarray(dirs, np.float32)
        n = o.shape[0]
        t = np.empty(n, np.float32)
        tri = np.empty(n, np.int32)
        self._lib.mesh_raycast(
            self._h, o.ctypes.data_as(_f32p), d.ctypes.data_as(_f32p), n,
            t.ctypes.data_as(_f32p), tri.ctypes.data_as(_i32p),
        )
        return t, tri
