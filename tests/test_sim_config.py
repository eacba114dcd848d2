import os

import numpy as np
import pytest

from video_dqn_tpu.sim.config import env_kwargs_from_config, get_config, get_sim_defaults
from video_dqn_tpu.sim.gibson import GibsonHouse, class_colors, make_synthetic_scene_graph


def test_sim_defaults_and_yaml_merge(tmp_path):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_config(os.path.join(here, "configs/tasks/pointnav_rgbd.yml"))
    assert cfg.SIMULATOR.RGB_SENSOR.WIDTH == 224
    assert cfg.SIMULATOR.TURN_ANGLE == 30
    assert cfg.ENVIRONMENT.MAX_EPISODE_STEPS == 1000000
    assert cfg.is_frozen
    kw = env_kwargs_from_config(cfg)
    assert kw["image_size"] == 224 and kw["forward_step"] == 0.25


def test_multi_file_merge(tmp_path):
    a = tmp_path / "a.yml"
    a.write_text("SIMULATOR:\n  TURN_ANGLE: 10\n")
    b = tmp_path / "b.yml"
    b.write_text("SIMULATOR:\n  TURN_ANGLE: 15\n")
    cfg = get_config(f"{a},{b}")
    assert cfg.SIMULATOR.TURN_ANGLE == 15  # later file wins


def test_class_colors_table():
    colors = class_colors()
    assert set(colors) == {"bed", "chair", "couch", "dining table", "toilet"}
    assert colors["bed"] == (175, 124, 222)


def test_house_floor_override_fallback(tmp_path):
    # house with no scene graph: floor count falls back to the vendored
    # override table (reference gibson_info.py:214-223)
    h = GibsonHouse({"id": "Allensville", "split_tiny": "none", "stats": {"floor": 9}})
    assert h.num_floors == 1  # Allensville override

    # synthetic scene graph wins when present
    sg = tmp_path / "graphs"
    make_synthetic_scene_graph(str(sg / "3DSceneGraph_Fake.npz"), "Fake")
    h2 = GibsonHouse({"id": "Fake", "split_tiny": "val"}, scene_graph_dir=str(sg))
    assert h2.num_floors == 1
    locs = h2.object_locations
    assert len(locs["toilet"]) == 2
    polys = h2.objects["toilet"]
    assert len(polys[0]) == 4
