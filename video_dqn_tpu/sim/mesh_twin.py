"""Numpy brute-force twin of the native mesh raycaster (test oracle).

Same math as native/simcore/mesh.cc — Moller-Trumbore over ALL triangles
(no BVH), identical camera model, shading, floor-probe semantics — so
native results must match it to float tolerance on small meshes. The
repo's standard oracle pattern (CLAUDE.md: "each [native component] has a
Python twin kept as the test oracle").
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class TwinMesh:
    def __init__(self, vertices: np.ndarray, faces: np.ndarray,
                 colors: Optional[np.ndarray] = None):
        self.v = np.asarray(vertices, np.float32)
        self.f = np.asarray(faces, np.int32)
        self.c = np.asarray(colors, np.uint8) if colors is not None else None
        self.p0 = self.v[self.f[:, 0]].astype(np.float64)
        self.e1 = self.v[self.f[:, 1]].astype(np.float64) - self.p0
        self.e2 = self.v[self.f[:, 2]].astype(np.float64) - self.p0
        n = np.cross(self.e1, self.e2)
        ln = np.linalg.norm(n, axis=1, keepdims=True)
        self.normals = np.where(ln > 0, n / np.maximum(ln, 1e-30), [0, 1, 0])

    def bounds(self):
        return self.v.min(axis=0).copy(), self.v.max(axis=0).copy()

    def _trace(self, o: np.ndarray, d: np.ndarray):
        """Single ray against all triangles. Returns (t, tri, u, v)."""
        pv = np.cross(d, self.e2)
        det = np.einsum("ij,ij->i", self.e1, pv)
        ok = np.abs(det) >= 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o - self.p0
        u = np.einsum("ij,ij->i", tv, pv) * inv
        qv = np.cross(tv, self.e1)
        v = qv @ d * inv
        t = np.einsum("ij,ij->i", self.e2, qv) * inv
        good = (
            ok & (u >= -1e-6) & (u <= 1 + 1e-6) & (v >= -1e-6)
            & (u + v <= 1 + 1e-6) & (t > 1e-6)
        )
        if not good.any():
            return np.inf, -1, 0.0, 0.0
        t = np.where(good, t, np.inf)
        i = int(np.argmin(t))
        return float(t[i]), i, float(u[i]), float(v[i])

    def raycast(self, origins: np.ndarray, dirs: np.ndarray):
        origins = np.atleast_2d(origins)
        dirs = np.atleast_2d(dirs)
        ts, tris = [], []
        for o, d in zip(origins.astype(np.float64), dirs.astype(np.float64)):
            t, tri, _, _ = self._trace(o, d)
            ts.append(t)
            tris.append(tri)
        return np.asarray(ts, np.float32), np.asarray(tris, np.int32)

    def render(self, poses: np.ndarray, size: int, cam, max_depth: float):
        poses = np.atleast_2d(np.asarray(poses, np.float64))
        V = poses.shape[0]
        depth = np.empty((V, size, size), np.float32)
        rgb = np.empty((V, size, size, 3), np.uint8)
        light = np.array([0.4, 0.8, 0.45])
        for view in range(V):
            x, y, z, a = poses[view]
            o = np.array([x, y, z])
            fwd = np.array([-np.sin(a), 0.0, -np.cos(a)])
            right = np.array([np.cos(a), 0.0, -np.sin(a)])
            up = np.array([0.0, 1.0, 0.0])
            for r in range(size):
                vv = (cam.zc - r) / cam.f
                for c in range(size):
                    uu = (c - cam.xc) / cam.f
                    d = fwd + right * uu + up * vv
                    t, tri, bu, bv = self._trace(o, d)
                    if not np.isfinite(t) or t > max_depth:
                        depth[view, r, c] = max_depth
                        rgb[view, r, c] = (20, 40, 60)
                        continue
                    depth[view, r, c] = t
                    lam = 0.35 + 0.65 * abs(float(self.normals[tri] @ light))
                    if self.c is not None:
                        i0, i1, i2 = self.f[tri]
                        col = (
                            (1 - bu - bv) * self.c[i0].astype(np.float64)
                            + bu * self.c[i1] + bv * self.c[i2]
                        )
                    else:
                        h = (tri * 2654435761) & 0xFFFFFFFF
                        col = np.array(
                            [60 + (h & 127), 60 + ((h >> 7) & 127),
                             60 + ((h >> 14) & 127)], np.float64)
                    rgb[view, r, c] = np.minimum(255, col * lam).astype(np.uint8)
        return depth, rgb

    def floor_levels(self, xz: np.ndarray, y_from: float, y_min: float,
                     clearance: float, max_levels: int = 8):
        xz = np.atleast_2d(xz)
        n = xz.shape[0]
        ys = np.zeros((n, max_levels), np.float32)
        oks = np.zeros((n, max_levels), bool)
        cnt = np.zeros(n, np.int32)
        down = np.array([0.0, -1.0, 0.0])
        upd = np.array([0.0, 1.0, 0.0])
        for i, (x, z) in enumerate(xz.astype(np.float64)):
            y = y_from
            found = 0
            while found < max_levels and y > y_min:
                t, tri, _, _ = self._trace(np.array([x, y, z]), down)
                if not np.isfinite(t) or t > y - y_min:
                    break
                fy = y - t
                ok = False
                if abs(self.normals[tri][1]) >= 0.7:
                    t2, _, _, _ = self._trace(np.array([x, fy + 0.05, z]), upd)
                    ok = (not np.isfinite(t2)) or t2 > clearance
                ys[i, found] = fy
                oks[i, found] = ok
                found += 1
                y = fy - 0.05
            cnt[i] = found
        return ys, oks, cnt

    def column_blocked(self, xz: np.ndarray, y_lo, y_hi,
                       radius: float) -> np.ndarray:
        """Exact SAT triangle/AABB overlap, brute force over triangles."""
        xz = np.atleast_2d(xz)
        n = xz.shape[0]
        y_lo = np.broadcast_to(np.asarray(y_lo, np.float64), (n,))
        y_hi = np.broadcast_to(np.asarray(y_hi, np.float64), (n,))
        out = np.zeros(n, bool)
        tri = np.stack(
            [self.p0, self.p0 + self.e1, self.p0 + self.e2], axis=1
        )  # (M, 3, 3)
        for i in range(n):
            c = np.array([xz[i, 0], 0.5 * (y_lo[i] + y_hi[i]), xz[i, 1]])
            half = np.array([radius, 0.5 * (y_hi[i] - y_lo[i]), radius])
            out[i] = _any_tri_box(tri, c, half)
        return out

    def floor_probe(self, xz: np.ndarray, y_from: float, max_drop: float,
                    clearance: float):
        xz = np.atleast_2d(xz)
        n = xz.shape[0]
        ys = np.empty(n, np.float32)
        ok = np.zeros(n, bool)
        down = np.array([0.0, -1.0, 0.0])
        upd = np.array([0.0, 1.0, 0.0])
        for i, (x, z) in enumerate(xz.astype(np.float64)):
            t, tri, _, _ = self._trace(np.array([x, y_from, z]), down)
            if not np.isfinite(t) or t > max_drop:
                ys[i] = np.nan
                continue
            floor_y = y_from - t
            ys[i] = floor_y
            if abs(self.normals[tri][1]) < 0.7:
                continue
            t2, tri2, _, _ = self._trace(
                np.array([x, floor_y + 0.05, z]), upd)
            ok[i] = (not np.isfinite(t2)) or t2 > clearance
        return ys, ok


def _any_tri_box(tri: np.ndarray, c: np.ndarray, half: np.ndarray) -> bool:
    """Vectorized Akenine-Moller SAT over all triangles (tri (M,3,3))."""
    v = tri - c  # (M, 3 verts, 3)
    e = np.stack([v[:, 1] - v[:, 0], v[:, 2] - v[:, 1], v[:, 0] - v[:, 2]],
                 axis=1)  # (M, 3 edges, 3)
    alive = np.ones(len(tri), bool)

    # box-axis tests
    for ax in range(3):
        mn = v[:, :, ax].min(axis=1)
        mx = v[:, :, ax].max(axis=1)
        alive &= ~((mn > half[ax]) | (mx < -half[ax]))
    if not alive.any():
        return False

    # 9 cross axes
    units = np.eye(3)
    for ei in range(3):
        for ax in range(3):
            axis = np.cross(units[ax], e[:, ei])  # (M, 3)
            p = np.einsum("mvk,mk->mv", v, axis)  # (M, 3)
            r = np.abs(axis) @ half
            alive &= ~((p.min(axis=1) > r) | (p.max(axis=1) < -r))
        if not alive.any():
            return False

    # plane test
    n = np.cross(e[:, 0], e[:, 1])
    d = -np.einsum("mk,mk->m", n, v[:, 0])
    r = np.abs(n) @ half
    alive &= np.abs(d) <= r
    return bool(alive.any())
