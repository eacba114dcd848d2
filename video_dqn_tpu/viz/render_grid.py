"""Pre-render a visualization grid from a nav env.

Produces the `<row>-<col>-<orientation>.jpg` + info.npy folders the
value-map visualizer consumes (the reference used externally pre-rendered
habitat grids under VISUALIZATION_DATA_ROOT,
/root/reference/visualize_value.py:63-67 + the dataset reader contract in
dataloaders/habitat_visualization_data_gibson.py:12-36). With the native
sim core this renders whole houses in seconds.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np


def render_grid(
    env,
    out_dir: str,
    resolution: int = 64,
    world_extent: Optional[float] = None,
    agent_location=None,
) -> int:
    """Render 4 orientations at every navigable grid cell of `env`.
    Returns the number of rendered cells. Grid rows/cols index the world
    extent uniformly (matching viz.value_map.to_grid)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    if world_extent is None:
        if hasattr(env, "grid"):  # occupancy-grid backend
            gh, gw = env.grid.shape
            world_extent = max(gh, gw) * env.cell
        else:  # mesh backend: navigable extent
            world_extent = float(env.topdown_extent())
    cells = 0
    for r in range(resolution):
        for c in range(resolution):
            z = (r + 0.5) / resolution * world_extent
            x = (c + 0.5) / resolution * world_extent
            if env._blocked(x, z):
                continue
            pos = np.array([x, 0.0, z])
            for o in range(4):
                env.set_agent_state(pos, o * math.pi / 2)
                obs = env.get_observation()
                Image.fromarray(obs["rgb"]).save(
                    os.path.join(out_dir, f"{r}-{c}-{o}.jpg")
                )
            cells += 1
    info = {
        "agent_location": np.asarray(
            agent_location if agent_location is not None else [0.0, 0.0, 0.0]
        ),
        "map_resolution": resolution,
        "world_extent": world_extent,
    }
    np.save(os.path.join(out_dir, "info.npy"), info, allow_pickle=True)
    return cells
