"""Point-cloud -> occupancy-count binning on device.

Capability parity with the reference's bincount-based bin_points
(/root/reference/map_and_plan_agent/depth_utils.py:67-96): round xy to
cells, digitize z into len(z_bins)+1 buckets, count valid points per
(y, x, z-bucket) cell; NaN and out-of-map points are dropped.

TPU-first: one fused scatter-add over the whole (possibly batched)
panorama — the 12 reasoning views bin in a single program and sum into
one map delta, replacing 12 host bincount passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 3))
def bin_points(xyz_cm: jax.Array, map_size: int, z_bins, xy_resolution: float):
    """xyz_cm: (..., H, W, 3) -> counts (map_size, map_size, len(z_bins)+1).

    Batched inputs are SUMMED into one count map (the mapper adds every
    view's counts anyway, reference evaluation/slam.py:160-162).
    z_bins must be a static tuple.
    """
    z_bins = jnp.asarray(z_bins, jnp.float32)
    n_z = z_bins.shape[0] + 1
    pts = xyz_cm.reshape(-1, 3)
    isnotnan = ~jnp.isnan(pts[:, 0])
    xb = jnp.round(pts[:, 0] / xy_resolution).astype(jnp.int32)
    yb = jnp.round(pts[:, 1] / xy_resolution).astype(jnp.int32)
    zb = jnp.searchsorted(z_bins, jnp.nan_to_num(pts[:, 2]), side="right").astype(jnp.int32)
    valid = (
        (xb >= 0) & (xb < map_size) & (yb >= 0) & (yb < map_size) & isnotnan
    )
    flat = (yb * map_size + xb) * n_z + zb
    flat = jnp.where(valid, flat, 0)
    counts = jnp.zeros((map_size * map_size * n_z,), jnp.float32)
    counts = counts.at[flat].add(valid.astype(jnp.float32))
    return counts.reshape(map_size, map_size, n_z)


@partial(jax.jit, static_argnums=(3, 5))
def observations_to_map_delta(
    depths_cm: jax.Array,     # (V, H, W) depth in cm, NaN-invalidated
    locs: jax.Array,          # (V, 3) map poses (x_cm, y_cm, theta)
    camera,                   # CameraMatrix
    map_size: int,
    sensor_height: float,
    z_bins,
    xy_resolution: float = 5.0,
    elevation_deg: float = 0.0,
):
    """Fused panorama mapping: unproject V depth views, rectify, place each
    at its pose, bin, and sum — ONE device program per reasoning step
    (the reference loops 12 host passes, evaluation/evaluate.py:189-203 +
    slam.py:146-162)."""
    from .geometry import get_point_cloud_from_z, make_geocentric, transform_to_frame

    def one(depth, loc):
        xyz = get_point_cloud_from_z(depth, camera)
        xyz = make_geocentric(xyz, sensor_height, elevation_deg)
        return transform_to_frame(xyz, loc)

    xyz_all = jax.vmap(one)(depths_cm, locs)  # (V, H, W, 3)
    return bin_points(xyz_all, map_size, z_bins, xy_resolution)
