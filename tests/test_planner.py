"""Mapper/planner behavior tests: mapping geometry, traversibility,
FMM caching, action search, collision injection — against the documented
reference semantics (evaluation/slam.py)."""

import math

import numpy as np
import pytest

from video_dqn_tpu.plan.mapper import (
    ACT_FORWARD,
    ACT_LEFT,
    ACT_RIGHT,
    ACT_STOP,
    DepthMapperAndPlanner,
    _build_sequences,
)


def make_planner(**kw):
    defaults = dict(dt=30, map_size_cm=2000, close_small_openings=False)
    defaults.update(kw)
    p = DepthMapperAndPlanner(**defaults)
    p._reset(goal_dist=5.0, start_pos=np.zeros(3), start_ang=0.0,
             camera_attrs=(32, 32, 90))
    return p


def wall_depth(dist_cm: float, size: int = 32) -> np.ndarray:
    """Flat wall at constant z-depth (cm) filling the view."""
    return np.full((size, size), dist_cm, np.float32)


def test_sequences_structure():
    seqs = _build_sequences(6)
    assert seqs[0] == [ACT_STOP]
    assert seqs[1] == [ACT_FORWARD]
    # 1 stop + 13 one-step + 13*13 two-step
    assert len(seqs) == 1 + 13 + 169


def test_wall_becomes_obstacle_ahead():
    p = make_planner()
    # wall 1 m ahead: at heading 0 the map +x direction
    p.add_observation(wall_depth(100.0))
    obstacle = p.map[:, :, 1] >= p.point_cnt
    cur = p.loc_to_map(p.current_loc)
    # obstacle cells should lie ~20 cells (100cm/5) in +x (= column) direction
    band = obstacle[cur[0] - 3 : cur[0] + 4, cur[1] + 17 : cur[1] + 23]
    assert band.sum() > 0
    # nothing behind the agent
    behind = obstacle[:, : cur[1] - 5]
    assert behind.sum() == 0


def test_batched_equals_sequential_mapping():
    p1 = make_planner()
    p2 = make_planner()
    depths = np.stack([wall_depth(100.0), wall_depth(150.0)])
    locs = np.array(
        [[*p1.current_loc[:2], 0.0], [*p1.current_loc[:2], np.pi / 2]], np.float32
    )
    p1.add_observations_batch(depths, locs)
    p2.add_observation(depths[0], locs[0])
    p2.add_observation(depths[1], locs[1])
    np.testing.assert_allclose(p1.map, p2.map, atol=1e-4)


def test_action_toward_open_space():
    p = make_planner()
    # empty map: everything traversible; goal 2 m in +x (heading 0 forward)
    goal = p.current_loc[:2] + np.array([200.0, 0.0])
    # pos_to_loc inverse: build a habitat pos that maps to `goal`
    # displacement = [-dz, -dx]*100 -> dz = -(gx)/100, dx = -(gy)/100
    d = (goal - p.start_loc[:2]) / 100.0
    pos = p.start_pos + np.array([-d[1], 0.0, -d[0]])
    act = p.get_action_toward(pos)
    assert act == ACT_FORWARD


def test_action_toward_behind_turns():
    p = make_planner()
    goal = p.current_loc[:2] + np.array([-200.0, 0.0])
    d = (goal - p.start_loc[:2]) / 100.0
    pos = p.start_pos + np.array([-d[1], 0.0, -d[0]])
    act = p.get_action_toward(pos)
    assert act in (ACT_LEFT, ACT_RIGHT)


def test_action_at_goal_stops():
    p = make_planner()
    act = p.get_action_toward(p.start_pos)
    assert act == ACT_STOP


def test_fmm_cache_and_invalidation():
    p = make_planner()
    d1 = p.fmm_map(loc=p.current_loc)
    d2 = p.fmm_map(loc=p.current_loc)
    assert d1 is d2  # cache hit
    p.add_observation(wall_depth(100.0))
    d3 = p.fmm_map(loc=p.current_loc)
    assert d3 is not d2


def test_fmm_distance_meters():
    p = make_planner()
    # goal 1 m ahead on empty map -> ~1 m fmm distance
    d = (np.array([100.0, 0.0])) / 100.0
    pos = p.start_pos + np.array([-d[1], 0.0, -d[0]])
    est = p.fmm_distance_m(pos)
    assert 0.8 < est < 1.3, est


def test_reachable_nearby_first_match():
    p = make_planner()
    near = p.start_pos + np.array([0.0, 0.0, -1.0])  # 1 m ahead
    far = p.start_pos + np.array([0.0, 0.0, -50.0])  # off-map
    assert p.reachable_nearby([far, near]) == 1
    assert p.reachable_nearby([near, far]) == 0
    assert p.reachable_nearby([far]) is None


def test_collision_injects_obstacle():
    p = make_planner()
    obs = {"depth": np.full((32, 32, 1), 9.9, np.float32)}
    before = p.map[:, :, 1].sum()
    # forward action but position unchanged -> collision (dist 0 <= 24cm)
    p.log_act(obs, p.start_pos, 0.0, ACT_FORWARD)
    after = p.map[:, :, 1].sum()
    assert after > before
    # the synthetic arc lies ahead of the agent (+x)
    cur = p.loc_to_map(p.current_loc)
    ahead = p.map[cur[0] - 2 : cur[0] + 3, cur[1] + 1 : cur[1] + 4, 1]
    assert ahead.sum() > 0


def test_committed_actions_replay():
    p = make_planner()
    pos = p.start_pos + np.array([0.0, 0.0, -2.0])
    p.committed_actions = (np.asarray(pos), [ACT_LEFT, ACT_FORWARD])
    assert p.get_action_toward(pos) == ACT_LEFT
    obs = {"depth": np.full((32, 32, 1), 9.9, np.float32)}
    p.log_act(obs, p.start_pos, 0.3, ACT_LEFT)
    assert p.committed_actions[1] == [ACT_FORWARD]
    # different goal drops the commitment
    assert p.get_action_toward(p.start_pos + np.array([1.0, 0, 0])) is not None
    assert p.committed_actions is None


def test_check_thrashing():
    f = DepthMapperAndPlanner.check_thrashing
    assert f(4, [0, 1, 2, 1, 2])
    assert not f(4, [0, 1, 1, 1, 2])  # not alternating
    assert not f(4, [2, 1, 2, 0])  # last action is forward
    assert not f(8, [1, 2, 1, 2])  # history too short


def test_fix_thrashing_commits_sequence():
    p = make_planner(fix_thrashing=True)
    # wall ahead forces a turn; goal straight ahead behind the wall
    p.map[:, :, 1] = 0
    cur = p.loc_to_map(p.current_loc)
    p.map[cur[0] - 12 : cur[0] + 13, cur[1] + 4, 1] = 10  # wall at +20 cm
    goal = p.start_pos + np.array([0.0, 0.0, -2.0])  # 2 m ahead
    p.last_act = ACT_RIGHT
    act = p.get_action_toward(goal)
    if act == ACT_LEFT:  # reversal detected -> sequence committed
        assert p.committed_actions is not None
        assert p.committed_actions[1][0] == ACT_LEFT


def test_close_small_openings_fallback():
    """If opening the map disconnects the agent, the planner retries with
    fewer erosions until reachable (reference slam.py:333-347)."""
    p = make_planner(close_small_openings=True)
    d = p.fmm_map(loc=p.current_loc)
    cur = p.loc_to_map(p.current_loc)
    assert np.isfinite(d[cur[0], cur[1]])
