"""Grid pre-rendering -> value-map pipeline: render a small grid from the
fake env, then build value maps over it with a real Q-net."""

import numpy as np

import jax
import jax.numpy as jnp

from video_dqn_tpu.models.qnet import HabitatDQN
from video_dqn_tpu.sim.fake_env import FakeNavEnv
from video_dqn_tpu.viz.render_grid import render_grid
from video_dqn_tpu.viz.value_map import VisualizationGrid, build_value_maps


def test_render_grid_then_value_maps(tmp_path):
    env = FakeNavEnv(image_size=96)
    out = str(tmp_path / "grid")
    n = render_grid(env, out, resolution=6)
    assert n > 0
    grid = VisualizationGrid(out, image_size=96)
    assert len(grid) == n

    model = HabitatDQN(action_dim=3, extra_capacity=False, panorama=False,
                       dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 1, 96, 96, 3)), False
    )
    maps, agg, free = build_value_maps(
        model, variables["params"], variables.get("batch_stats", {}),
        out, panorama=False, resolution=6, image_size=96,
    )
    assert free.sum() == n
    info = np.load(out + "/info.npy", allow_pickle=True)[()]
    assert info["map_resolution"] == 6
