"""Geometry / binning / morphology / FMM parity tests against numpy
oracles implementing the documented reference semantics
(map_and_plan_agent/depth_utils.py, rotation_utils.py, evaluation/slam.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_dqn_tpu.ops.binning import bin_points, observations_to_map_delta
from video_dqn_tpu.ops.fmm import fmm_distance
from video_dqn_tpu.ops.geometry import (
    get_camera_matrix,
    get_point_cloud_from_z,
    make_geocentric,
    rodrigues,
    transform_to_frame,
)
from video_dqn_tpu.ops.morphology import (
    binary_dilation_disk1,
    binary_erosion_disk1,
    open_n,
)


# ---- numpy oracles (reference semantics) --------------------------------

def np_camera(width, height, fov):
    xc = (width - 1.0) / 2.0
    zc = (height - 1.0) / 2.0
    f = (width / 2.0) / np.tan(np.deg2rad(fov / 2.0))
    return xc, zc, f


def np_pointcloud(Y, cm):
    xc, zc, f = cm
    x, z = np.meshgrid(np.arange(Y.shape[-1]), np.arange(Y.shape[-2] - 1, -1, -1))
    X = (x - xc) * Y / f
    Z = (z - zc) * Y / f
    return np.stack([X, Y, Z], -1)


def np_rodrigues(ax, angle):
    ax = np.asarray(ax, float)
    ax = ax / np.linalg.norm(ax)
    S = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return np.eye(3) + np.sin(angle) * S + (1 - np.cos(angle)) * (S @ S)


def np_bin_points(xyz, map_size, z_bins, res):
    n_z = len(z_bins) + 1
    pts = xyz.reshape(-1, 3)
    isnotnan = ~np.isnan(pts[:, 0])
    xb = np.round(pts[:, 0] / res).astype(int)
    yb = np.round(pts[:, 1] / res).astype(int)
    zb = np.digitize(np.nan_to_num(pts[:, 2]), z_bins)
    valid = (xb >= 0) & (xb < map_size) & (yb >= 0) & (yb < map_size) & isnotnan
    counts = np.zeros((map_size, map_size, n_z))
    for i in np.where(valid)[0]:
        counts[yb[i], xb[i], zb[i]] += 1
    return counts


def test_camera_matrix():
    cm = get_camera_matrix(224, 224, 90)
    xc, zc, f = np_camera(224, 224, 90)
    assert (cm.xc, cm.zc) == (xc, zc)
    np.testing.assert_allclose(cm.f, f)


def test_pointcloud_parity(rng):
    depth = rng.random((8, 12)).astype(np.float32) * 500
    cm = get_camera_matrix(12, 8, 90)
    got = np.asarray(get_point_cloud_from_z(jnp.asarray(depth), cm))
    want = np_pointcloud(depth, (cm.xc, cm.zc, cm.f))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rodrigues_parity(rng):
    for _ in range(3):
        ax = rng.standard_normal(3)
        ang = rng.random() * np.pi
        np.testing.assert_allclose(
            np.asarray(rodrigues(jnp.asarray(ax, jnp.float32), ang)),
            np_rodrigues(ax, ang),
            atol=1e-5,
        )
    # zero angle must be exact identity (the reference epsilon-branches)
    np.testing.assert_allclose(
        np.asarray(rodrigues(jnp.array([0.0, 0.0, 1.0]), 0.0)), np.eye(3), atol=1e-7
    )


def test_geocentric_parity(rng):
    xyz = rng.standard_normal((4, 6, 3)).astype(np.float32) * 100
    got = np.asarray(make_geocentric(jnp.asarray(xyz), 125.0, -10.0))
    R = np_rodrigues([1.0, 0, 0], np.deg2rad(-10.0))
    want = xyz.reshape(-1, 3) @ R.T
    want = want.reshape(xyz.shape)
    want[..., 2] += 125.0
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_transform_to_frame(rng):
    xyz = rng.standard_normal((5, 5, 3)).astype(np.float32) * 50
    loc = np.array([120.0, 80.0, np.pi / 3], np.float32)
    got = np.asarray(transform_to_frame(jnp.asarray(xyz), jnp.asarray(loc)))
    R = np_rodrigues([0, 0, 1.0], loc[2] - np.pi / 2)
    want = (xyz.reshape(-1, 3) @ R.T).reshape(xyz.shape)
    want[..., 0] += loc[0]
    want[..., 1] += loc[1]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_bin_points_parity(rng):
    xyz = (rng.random((10, 10, 3)) * 300 - 20).astype(np.float32)
    xyz[0, 0] = np.nan
    got = np.asarray(bin_points(jnp.asarray(xyz), 40, (20.0, 125.0), 5.0))
    want = np_bin_points(xyz, 40, [20.0, 125.0], 5.0)
    np.testing.assert_array_equal(got, want)


def test_bin_points_batched_sums(rng):
    xyz = (rng.random((3, 6, 6, 3)) * 150).astype(np.float32)
    got = np.asarray(bin_points(jnp.asarray(xyz), 40, (20.0, 125.0), 5.0))
    want = sum(np_bin_points(xyz[i], 40, [20.0, 125.0], 5.0) for i in range(3))
    np.testing.assert_array_equal(got, want)


def test_observations_to_map_delta_matches_sequential(rng):
    """The fused 12-view program must equal view-by-view oracle mapping."""
    cm = get_camera_matrix(16, 16, 90)
    depths = (rng.random((3, 16, 16)) * 400 + 50).astype(np.float32)
    locs = np.array(
        [[500, 500, 0.0], [500, 500, np.pi / 2], [510, 490, np.pi]], np.float32
    )
    got = np.asarray(
        observations_to_map_delta(
            jnp.asarray(depths), jnp.asarray(locs), cm, 240, 125.0,
            (20.0, 125.0), 5.0,
        )
    )
    want = np.zeros((240, 240, 3))
    for i in range(3):
        xyz = np_pointcloud(depths[i], (cm.xc, cm.zc, cm.f))
        R = np_rodrigues([1.0, 0, 0], 0.0)
        xyz = xyz @ R.T
        xyz[..., 2] += 125.0
        R2 = np_rodrigues([0, 0, 1.0], locs[i, 2] - np.pi / 2)
        xyz = (xyz.reshape(-1, 3) @ R2.T).reshape(xyz.shape)
        xyz[..., 0] += locs[i, 0]
        xyz[..., 1] += locs[i, 1]
        want += np_bin_points(xyz, 240, [20.0, 125.0], 5.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---- morphology ----------------------------------------------------------

def np_dilate_plus(m):
    out = m.copy()
    out[:-1] |= m[1:]
    out[1:] |= m[:-1]
    out[:, :-1] |= m[:, 1:]
    out[:, 1:] |= m[:, :-1]
    return out


def np_erode_plus(m):
    return ~np_dilate_plus(~m)


def test_morphology_parity(rng):
    m = rng.random((20, 20)) < 0.4
    np.testing.assert_array_equal(
        np.asarray(binary_dilation_disk1(jnp.asarray(m))), np_dilate_plus(m)
    )
    # skimage erodes with False padding at borders
    padded = np.pad(m, 1, constant_values=False)
    want_er = np_erode_plus(padded)[1:-1, 1:-1]
    np.testing.assert_array_equal(
        np.asarray(binary_erosion_disk1(jnp.asarray(m))), want_er
    )


def test_open_n_removes_thin_passages():
    m = np.ones((15, 15), bool)
    m[:, 7] = True  # 1-wide corridor stays in plain mask
    m[0:7, 0:7] = True
    got = np.asarray(open_n(jnp.asarray(m), 2))
    # interior survives opening, border erodes away
    assert got[7, 7]
    assert not got[0, 0]


# ---- FMM -----------------------------------------------------------------

def test_fmm_native_matches_python(rng):
    mask = rng.random((30, 30)) < 0.8
    mask[15, 15] = True
    dn = fmm_distance(mask, [(15, 15)], engine="native")
    dp = fmm_distance(mask, [(15, 15)], engine="python")
    both = np.isfinite(dn) & np.isfinite(dp)
    np.testing.assert_allclose(dn[both], dp[both], atol=1e-9)
    np.testing.assert_array_equal(np.isinf(dn), np.isinf(dp))


def test_fmm_distances_reasonable():
    mask = np.ones((21, 21), bool)
    d = fmm_distance(mask, [(10, 10)])
    assert d[10, 10] == 0
    np.testing.assert_allclose(d[10, 20], 10.0, atol=0.1)  # straight line
    diag = d[20, 20]
    # ~10*sqrt(2)=14.14; first-order upwind FMM overestimates diagonals by
    # up to ~6% (skfmm's default order shows the same band)
    assert 13.5 < diag < 15.2

def test_fmm_bounded_matches_full_inside_band(rng):
    mask = rng.random((60, 60)) < 0.85
    mask[30, 30] = mask[30, 45] = True
    full = fmm_distance(mask, [(30, 30)])
    for engine in ("native", "python"):
        bounded = fmm_distance(mask, [(30, 30)], engine=engine,
                               early_stop=(30, 45), margin=10.0)
        agent_d = full[30, 45]
        inside = np.isfinite(full) & (full <= agent_d + 10.0 - 1e-9)
        # every cell within the band carries its exact full-solve value
        np.testing.assert_allclose(bounded[inside], full[inside], atol=1e-9)
        # and nothing outside leaks a tentative (non-final) value
        assert not np.isfinite(bounded[full > agent_d + 10.0 + 1.0]).any()


def test_fmm_max_dist_bound():
    mask = np.ones((50, 50), bool)
    d = fmm_distance(mask, [(25, 25)], max_dist=8.0)
    assert np.isfinite(d[25, 33]) and d[25, 33] == pytest.approx(8.0, abs=0.01)
    assert not np.isfinite(d[25, 40])
    full = fmm_distance(mask, [(25, 25)])
    inside = np.isfinite(d)
    np.testing.assert_allclose(d[inside], full[inside], atol=1e-9)


def test_fmm_masked_unreachable():
    mask = np.ones((10, 10), bool)
    mask[:, 5] = False  # wall splits the grid
    d = fmm_distance(mask, [(0, 0)])
    assert np.isinf(d[0, 9])
    assert np.isfinite(d[9, 0])


def test_fmm_goal_on_obstacle_still_solves():
    """Goal cells are forced traversible before seeding, matching the
    reference's unmask (/root/reference/evaluation/slam.py:27-29). A
    waypoint whose cell was mapped as an obstacle after selection (stale
    open-list entry) must still yield a finite field, not all-inf."""
    mask = np.ones((21, 21), bool)
    mask[10, 10] = False  # the goal cell itself is an obstacle
    for engine in ("native", "python"):
        d = fmm_distance(mask, [(10, 10)], engine=engine)
        assert d[10, 10] == 0.0
        assert np.isfinite(d[10, 12])
        assert abs(d[10, 12] - 2.0) < 0.2
    dn = fmm_distance(mask, [(10, 10)], engine="native")
    dp = fmm_distance(mask, [(10, 10)], engine="python")
    np.testing.assert_allclose(dn, dp, rtol=1e-9, atol=1e-9)


def test_fmm_goal_on_obstacle_bounded():
    mask = np.ones((31, 31), bool)
    mask[5:26, 15] = False
    mask[15, 15] = False
    for engine in ("native", "python"):
        d = fmm_distance(mask, [(15, 15)], engine=engine,
                         early_stop=(15, 20), margin=2.0)
        assert d[15, 15] == 0.0
        assert np.isfinite(d[15, 20])


def test_fmm_leaves_caller_mask_unchanged():
    """The native solver flips goal cells traversible IN the caller's
    buffer (zero-copy bool view) and must restore them before returning —
    the planner passes its cached opened grids directly."""
    mask = np.ones((31, 31), bool)
    mask[10:20, 14] = False
    mask[15, 15] = False  # goal on an obstacle
    snapshot = mask.copy()
    assert mask.flags.c_contiguous and mask.flags.writeable
    fmm_distance(mask, [(15, 15)], engine="native")
    np.testing.assert_array_equal(mask, snapshot)
    # duplicate goals (same cell twice) must also restore cleanly
    fmm_distance(mask, [(15, 15), (15, 15)], engine="native")
    np.testing.assert_array_equal(mask, snapshot)
    # read-only input takes the copy path and still solves
    ro = snapshot.copy()
    ro.setflags(write=False)
    d = fmm_distance(ro, [(15, 15)], engine="native")
    assert d[15, 15] == 0.0
    np.testing.assert_array_equal(ro, snapshot)
