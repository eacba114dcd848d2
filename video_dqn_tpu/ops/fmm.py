"""Fast-marching distances on masked grids.

Replaces the reference's scikit-fmm dependency
(/root/reference/evaluation/slam.py:19-30: masked grid, goal cell zeroed,
dx=1). Two engines:

  * native: heap-based C++ eikonal solver (native/fmm/libfmm.so via
    ctypes), auto-built on first use — the production path;
  * python: identical algorithm in numpy+heapq, used as a correctness
    oracle in tests and as a fallback when no compiler is available.

Distances are in grid units; masked/unreachable cells are +inf.
"""

from __future__ import annotations

import ctypes
import heapq
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "fmm")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfmm.so"))
_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-s"], cwd=os.path.abspath(_NATIVE_DIR), check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fmm_distance.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.fmm_distance.restype = None
        lib.fmm_distance_bounded.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.fmm_distance_bounded.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def fmm_distance(
    traversible: np.ndarray,
    goals: Sequence[Tuple[int, int]],
    engine: Optional[str] = None,
    early_stop: Optional[Tuple[int, int]] = None,
    margin: float = 0.0,
    max_dist: Optional[float] = None,
) -> np.ndarray:
    """traversible: (H, W) bool; goals: list of (y, x) seed cells.
    Returns float64 (H, W) distances (+inf where masked/unreached).

    Bounded solves (either knob; values inside the bound are exact):
      early_stop=(y, x): stop once that cell is accepted plus `margin`
        extra wavefront distance — the planner's "distance to the agent +
        neighborhood" query explores a band instead of the whole map;
      max_dist: stop the wavefront at this distance (cells beyond: +inf).
    """
    # bool -> uint8 is a free reinterpret; the native solver temporarily
    # flips goal cells in this buffer and restores them before returning
    # (single-threaded contract), so sharing the caller's memory is safe
    # and skips a 1.4MB copy per solve on the 1201x1201 eval grid.
    # NON-REENTRANT by design: concurrent solves over the SAME grid (e.g.
    # a future thread-parallel batched eval sharing plan/mapper's
    # opened-grid cache) would observe each other's mid-solve goal flips.
    # Set VDQN_FMM_FORCE_COPY=1 to force the copy path when diagnosing a
    # suspected aliasing/reentrancy bug.
    if (
        traversible.dtype == np.bool_
        and traversible.flags.c_contiguous
        and traversible.flags.writeable
        and os.environ.get("VDQN_FMM_FORCE_COPY", "0") != "1"
    ):
        mask = traversible.view(np.uint8)
    else:
        mask = np.ascontiguousarray(traversible.astype(np.uint8))
    h, w = mask.shape
    gy = np.ascontiguousarray([g[0] for g in goals], np.int32)
    gx = np.ascontiguousarray([g[1] for g in goals], np.int32)
    bounded = early_stop is not None or max_dist is not None

    lib = _load_native() if engine in (None, "native") else None
    if lib is not None and engine != "python":
        out = np.empty(h * w, np.float64)
        if bounded:
            ey, ex = early_stop if early_stop is not None else (-1, -1)
            lib.fmm_distance_bounded(
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                h, w,
                gy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                gx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(goals), int(ey), int(ex), float(margin),
                float(max_dist if max_dist is not None else -1.0),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
        else:
            lib.fmm_distance(
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                h, w,
                gy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                gx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(goals),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
        return out.reshape(h, w)
    return _fmm_python(
        mask, list(zip(gy.tolist(), gx.tolist())),
        early_stop=early_stop, margin=margin, max_dist=max_dist,
    )


def _solve_eikonal(tx: float, ty: float) -> float:
    tmin, tmax = (tx, ty) if tx < ty else (ty, tx)
    if tmax == np.inf:
        return tmin + 1.0
    diff = tmax - tmin
    if diff >= 1.0:
        return tmin + 1.0
    s = tx + ty
    disc = s * s - 2.0 * (tx * tx + ty * ty - 1.0)
    return 0.5 * (s + np.sqrt(disc))


def _fmm_python(mask: np.ndarray, goals, early_stop=None, margin: float = 0.0,
                max_dist=None) -> np.ndarray:
    h, w = mask.shape
    out = np.full((h, w), np.inf)
    accepted = np.zeros((h, w), bool)
    heap = []
    # Goal cells are forced traversible, matching the reference's unmask
    # (/root/reference/evaluation/slam.py:27-29) — a goal mapped as an
    # obstacle after selection must still produce a distance field.
    mask = mask.copy()
    for y, x in goals:
        if 0 <= y < h and 0 <= x < w:
            mask[y, x] = 1
            out[y, x] = 0.0
            heapq.heappush(heap, (0.0, y, x))
    stop_at = max_dist if max_dist is not None else np.inf
    while heap:
        if heap[0][0] > stop_at:
            break
        t, cy, cx = heapq.heappop(heap)
        if accepted[cy, cx]:
            continue
        accepted[cy, cx] = True
        if early_stop is not None and (cy, cx) == tuple(early_stop):
            stop_at = min(stop_at, t + margin)
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx = cy + dy, cx + dx
            if not (0 <= ny < h and 0 <= nx < w):
                continue
            if not mask[ny, nx] or accepted[ny, nx]:
                continue
            tx = min(
                out[ny, nx - 1] if nx > 0 and mask[ny, nx - 1] else np.inf,
                out[ny, nx + 1] if nx < w - 1 and mask[ny, nx + 1] else np.inf,
            )
            ty = min(
                out[ny - 1, nx] if ny > 0 and mask[ny - 1, nx] else np.inf,
                out[ny + 1, nx] if ny < h - 1 and mask[ny + 1, nx] else np.inf,
            )
            tt = _solve_eikonal(tx, ty)
            if tt < out[ny, nx]:
                out[ny, nx] = tt
                heapq.heappush(heap, (tt, ny, nx))
    out[~accepted] = np.inf  # tentative values outside the bound are not final
    return out
