"""Visualization + utils + canonical-planner tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from video_dqn_tpu.plan.fmm_planner import FMMPlanner, FORWARD, LEFT, RIGHT, STOP
from video_dqn_tpu.utils import (
    angle_delta,
    argmax,
    argmin,
    chunks_num,
    one_hot,
    pad_to,
    split_columns,
)
from video_dqn_tpu.viz.panorama import join_images
from video_dqn_tpu.viz.value_map import (
    VisualizationGrid,
    build_value_maps,
    crop_range,
    render_value_map,
)


# ---- utils ---------------------------------------------------------------

def test_argmax_first_tie_break():
    assert argmax([1, 3, 3, 2]) == (1, 3, 3)
    assert argmin([3, 1, 1, 2]) == (1, 1, 1)
    assert argmax([(0, 5), (1, 5)], lambda x: x[1])[0] == 0


def test_split_columns_and_pad():
    a = np.arange(22)
    parts = split_columns(a, [1, 3, 4, 1, 3, 4, 1, 5])
    assert [p.shape[-1] for p in parts] == [1, 3, 4, 1, 3, 4, 1, 5]
    with pytest.raises(ValueError):
        split_columns(a, [10, 10])
    assert pad_to(5, np.ones((3, 2))).shape == (5, 2)
    np.testing.assert_array_equal(pad_to(2, np.arange(4)), [2, 3])


def test_misc_utils():
    np.testing.assert_array_equal(one_hot(3, 1), [0, 1, 0])
    assert chunks_num(list(range(7)), 3) == [[0, 1, 2], [3, 4], [5, 6]]
    assert angle_delta(0.1, 2 * np.pi + 0.1) == pytest.approx(0.0, abs=1e-9)


# ---- panorama strip ------------------------------------------------------

def test_join_images_contract(rng):
    ims = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(12)]
    strip = join_images(ims)
    # 12 center crops of width 2*int(((4/12)-0.05)*64/2)
    w = 2 * int(((4.0 / 12) - 0.05) * 64 / 2)
    assert strip.shape == (64, 12 * w, 3)
    annotated = join_images(ims, values=np.arange(12.0))
    assert annotated.shape == (64 + 50, 12 * w, 3)


def test_join_images_golden_pixels():
    """Byte-stability of the episode-video strip layout: the committed
    golden (tests/data/join_images_golden.npz, rendered by the pre-rewrite
    implementation) must reproduce EXACTLY — the strip feeds committed
    video artifacts, so any pixel change is an artifact-format break."""
    g = np.load(os.path.join(os.path.dirname(__file__), "data",
                             "join_images_golden.npz"))
    ims = list(g["ims"])
    np.testing.assert_array_equal(join_images(ims), g["plain"])
    np.testing.assert_array_equal(
        join_images(ims, g["vals"], br_text="bed", bl_text="step 7"),
        g["annotated"])


# ---- value maps ----------------------------------------------------------

def make_grid_folder(tmp_path, rows=2, cols=2, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path / "grid"
    d.mkdir()
    for r in range(rows):
        for c in range(cols):
            for o in range(4):
                Image.fromarray(
                    rng.integers(0, 255, (size, size, 3), np.uint8)
                ).save(d / f"{r}-{c}-{o}.jpg")
    return str(d)


def test_visualization_grid_reader(tmp_path):
    folder = make_grid_folder(tmp_path)
    grid = VisualizationGrid(folder, image_size=32)
    assert len(grid) == 4
    cell = grid.load_cell(0, 1)
    assert cell.shape == (4, 32, 32, 3)


def test_build_value_maps_single_and_panorama(tmp_path):
    import jax

    from video_dqn_tpu.models.qnet import HabitatDQN

    folder = make_grid_folder(tmp_path, size=96)
    for panorama in (False, True):
        model = HabitatDQN(action_dim=3, extra_capacity=False,
                           panorama=panorama, dtype=jnp.float32)
        x = jnp.zeros((1, model.num_frames, 96, 96, 3))
        variables = model.init(jax.random.key(0), x, False)
        maps, agg, free = build_value_maps(
            model, variables["params"], variables.get("batch_stats", {}),
            folder, panorama, resolution=8, image_size=96,
        )
        assert len(maps) == 4 and maps[0].shape == (8, 8, 5)
        assert free.sum() == 4  # 2x2 grid cells
        np.testing.assert_allclose(agg, np.stack(maps).max(0))


def test_render_value_map_and_crop():
    vm = np.zeros((10, 10))
    free = np.zeros((10, 10))
    free[2:5, 3:7] = 1
    vm[2:5, 3:7] = np.arange(12).reshape(3, 4)
    img = render_value_map(vm, free, mark_cells=[(2, 3)])
    assert img.shape == (3, 4, 3)  # cropped to the free extent
    assert img.dtype == np.uint8
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0])  # mark
    assert crop_range(free) == ((2, 5), (3, 7))


# ---- canonical FMM planner ----------------------------------------------

def test_fmm_planner_forward_when_goal_ahead():
    trav = np.ones((40, 40), bool)
    p = FMMPlanner(trav, num_rots=12)
    assert p.set_goal((30, 20)).all()
    act, state, acts = p.get_action((10.0, 20.0, 0.0))  # facing +x
    assert act == FORWARD
    assert state[0] > 10.0


def test_fmm_planner_turns_when_goal_behind():
    trav = np.ones((40, 40), bool)
    p = FMMPlanner(trav, num_rots=12)
    p.set_goal((5, 20))
    act, _, _ = p.get_action((30.0, 20.0, 0.0))
    assert act in (LEFT, RIGHT)


def test_fmm_planner_collision_avoidance():
    trav = np.ones((40, 40), bool)
    trav[:, 15:17] = False  # wall ahead of the agent
    trav[5:8, 15:17] = True  # door at the top
    p = FMMPlanner(trav, num_rots=12)
    p.set_goal((30, 20))
    # agent right before the wall, facing it: forward collides
    act, _, _ = p.get_action((13.0, 20.0, 0.0))
    assert act != FORWARD


def test_fmm_planner_out_of_bounds_goal():
    p = FMMPlanner(np.ones((20, 20), bool), num_rots=12)
    mask = p.set_goal((100, 100))
    assert not mask.any()


def test_fmm_planner_search_actions_order():
    p = FMMPlanner(np.ones((10, 10), bool), num_rots=2)
    assert p.action_list == [
        [FORWARD], [STOP],
        [LEFT, FORWARD], [RIGHT, FORWARD],
        [LEFT, LEFT, FORWARD], [RIGHT, RIGHT, FORWARD],
    ]


def test_virtual_steps_near_goal_reward():
    p = FMMPlanner(np.ones((20, 20), bool), num_rots=12)
    p.set_goal((12, 10))
    rew, states = p._virtual_steps([FORWARD], (5.0, 10.0, 0.0))
    # moved 5 cells toward goal (7 away -> 2 away): -(2-7) + 1 near-goal
    assert rew > 5.0


def test_vis_panorama_correlation_analysis(tmp_path):
    """The value/distance correlation analysis (reference
    visualize_panorama.py:70-215): a scorer whose per-class view values
    ARE each heading's geodesic distance-drop must correlate at exactly
    +1 for every class, an anti-correlated scorer at -1, and the figure
    file must be written. Probe geometry is validated independently: the
    test replays the same rotate+forward-step probes to compute the
    expected dist-diffs before handing them to the scorer."""
    import math

    from video_dqn_tpu.sim.fake_env import FakeNavEnv
    from video_dqn_tpu.viz.panorama import min_dists, vis_panorama

    env = FakeNavEnv(image_size=48, seed=3)
    env.reset(reachable=False)
    goals_by_class = [[env.sample_reachable_goal()] for _ in range(5)]

    # independently replay the probe: for each heading, one forward step
    pos, rot = env.agent_state()
    base = min_dists(env, goals_by_class, pos)
    expected = []
    for k in range(12):
        env.set_agent_state(pos, rot + 2 * math.pi * k / 12)
        for _ in range(4):
            env.step(0)
        expected.append(base - min_dists(env, goals_by_class))
        env.set_agent_state(pos, rot)
    expected = np.stack(expected)  # (12, 5)
    assert expected.std(axis=0).min() > 0, "probe saw no distance variation"

    out = str(tmp_path / "corr.png")
    fig, corrs = vis_panorama(
        env, lambda views: 2.0 * expected + 7.0, goals_by_class,
        num=12, class_names=["a", "b", "c", "d", "e"], out_path=out,
        probe_steps=4,
    )
    np.testing.assert_allclose(corrs, np.ones(5), atol=1e-9)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    # agent restored
    p2, r2 = env.agent_state()
    np.testing.assert_array_equal(p2, pos)
    assert r2 == rot

    _, anti = vis_panorama(env, lambda v: -expected, goals_by_class, num=12,
                           probe_steps=4)
    np.testing.assert_allclose(anti, -np.ones(5), atol=1e-9)

    # a class with NO goals (inf distances) gets corr NaN, not a crash
    _, part = vis_panorama(
        env, lambda v: expected[:, :2], [goals_by_class[0], []], num=12,
        probe_steps=4,
    )
    assert np.isclose(part[0], 1.0) and np.isnan(part[1])
