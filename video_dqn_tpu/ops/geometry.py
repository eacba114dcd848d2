"""Depth-camera geometry as jitted JAX ops.

Capability parity with the reference's numpy depth utilities
(/root/reference/map_and_plan_agent/depth_utils.py:22-65 and
rotation_utils.py:27-37): pinhole camera matrix, depth->point-cloud
unprojection (X right, Y into the image, Z up), geocentric rectification
by camera elevation + sensor height, Rodrigues rotation matrices.

TPU-first: everything is batched and fused under jit (the reference runs
per-frame numpy on host); coordinates are computed with broadcasted iota
so the whole panorama (12 views) unprojects as one program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CameraMatrix(NamedTuple):
    xc: float
    zc: float
    f: float


def get_camera_matrix(width: int, height: int, fov_deg: float) -> CameraMatrix:
    xc = (width - 1.0) / 2.0
    zc = (height - 1.0) / 2.0
    f = (width / 2.0) / np.tan(np.deg2rad(fov_deg / 2.0))
    return CameraMatrix(xc=float(xc), zc=float(zc), f=float(f))


def get_point_cloud_from_z(depth: jax.Array, cm: CameraMatrix) -> jax.Array:
    """depth: (..., H, W) -> (..., H, W, 3); X right, Y forward (into the
    image), Z up. Row 0 of the image is the TOP (z index counts down)."""
    h, w = depth.shape[-2], depth.shape[-1]
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    z = (h - 1) - jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    X = (x - cm.xc) * depth / cm.f
    Z = (z - cm.zc) * depth / cm.f
    return jnp.stack([X, depth, Z], axis=-1)


def rodrigues(axis, angle) -> jax.Array:
    """Rotation matrix about `axis` by `angle` (rad). Traced-safe: no
    epsilon branch — sin/cos handle angle=0 exactly."""
    ax = jnp.asarray(axis, jnp.float32)
    ax = ax / jnp.linalg.norm(ax)
    s_hat = jnp.array(
        [
            [0.0, -ax[2], ax[1]],
            [ax[2], 0.0, -ax[0]],
            [-ax[1], ax[0], 0.0],
        ],
        jnp.float32,
    )
    return (
        jnp.eye(3, dtype=jnp.float32)
        + jnp.sin(angle) * s_hat
        + (1.0 - jnp.cos(angle)) * (s_hat @ s_hat)
    )


def make_geocentric(xyz: jax.Array, sensor_height, camera_elevation_deg) -> jax.Array:
    """Rectify camera elevation and add sensor height to Z. xyz: (..., 3)."""
    r = rodrigues(jnp.array([1.0, 0.0, 0.0]), jnp.deg2rad(camera_elevation_deg))
    out = xyz @ r.T
    return out.at[..., 2].add(sensor_height)


def transform_to_frame(xyz: jax.Array, loc: jax.Array) -> jax.Array:
    """Place an egocentric point cloud at map pose loc = (x, y, theta):
    rotate about +z by (theta - pi/2) — the camera looks along +y, the map
    heading 0 is +x — then translate by (x, y). Exact semantics of the
    reference mapper's transform_to_current_frame
    (/root/reference/evaluation/slam.py:231-237)."""
    r = rodrigues(jnp.array([0.0, 0.0, 1.0]), loc[2] - jnp.pi / 2.0)
    out = xyz @ r.T
    return out.at[..., 0].add(loc[0]).at[..., 1].add(loc[1])
