"""Value-map visualization: render per-class Q-value heatmaps over a
pre-rendered house grid.

Capability parity with /root/reference/visualize_value.py:60-157 and the
grid dataset /root/reference/dataloaders/habitat_visualization_data_gibson.py:
  * data folder of `row-col-orientation.jpg` images (4 orientations/cell)
  * panorama mode rolls the 4-frame stack by orientation (:32-36)
  * per-orientation (R, C, num_classes) value maps = max-over-actions Q;
    plus the 4-orientation max aggregate; free-space mask
  * viridis rendering normalized over free cells with object locations
    marked red, cropped to the occupied extent

TPU-first: ALL cells are scored in large batched jitted forwards (the
reference runs a DataLoader of batch 32 per orientation); panorama
orientation rolls become one gather on the stacked batch.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np


class VisualizationGrid:
    """Pre-rendered grid reader: `<row>-<col>-<orientation>.jpg`."""

    def __init__(self, data_folder: str, image_size: int = 224):
        self.data_folder = data_folder
        self.image_size = image_size
        cells = set()
        for f in os.listdir(data_folder):
            m = re.search(r"(\d+)-(\d+)-\d+\.jpg$", f)
            if m:
                cells.add((int(m.group(1)), int(m.group(2))))
        self.cells: List[Tuple[int, int]] = sorted(cells)

    def __len__(self) -> int:
        return len(self.cells)

    def load_cell(self, row: int, col: int) -> np.ndarray:
        """(4, S, S, 3) uint8 — the four orientations of one cell."""
        from video_dqn_tpu.data.qlearning import _load_image

        return np.stack(
            [
                _load_image(
                    os.path.join(self.data_folder, f"{row}-{col}-{o}.jpg"),
                    self.image_size,
                )
                for o in range(4)
            ]
        )

    def batches(self, batch_size: int = 64):
        """Yield (rows, cols, images (B, 4, S, S, 3))."""
        for i in range(0, len(self.cells), batch_size):
            chunk = self.cells[i : i + batch_size]
            images = np.stack([self.load_cell(r, c) for r, c in chunk])
            rows = np.array([r for r, _ in chunk])
            cols = np.array([c for _, c in chunk])
            yield rows, cols, images


def build_value_maps(
    model,
    params,
    batch_stats,
    data_root: str,
    panorama: bool,
    resolution: int = 1500,
    num_classes: int = 5,
    batch_size: int = 64,
    image_size: int = 224,
):
    """Returns (maps [4 x (R, C, num_classes)], agg_map, free_map).

    One jitted scorer evaluates all four orientations of a batch of cells
    in a single forward: panorama inputs are the rolled 4-stacks, single
    frame inputs are the individual orientations."""
    import jax
    import jax.numpy as jnp

    from video_dqn_tpu.ops.image import normalize_imagenet

    @jax.jit
    def score(images):  # (B, F, S, S, 3) uint8 -> (B, num_classes)
        x = normalize_imagenet(images.astype(jnp.float32) / 255.0)
        q = model.apply({"params": params, "batch_stats": batch_stats}, x, False)
        return q.max(axis=-1)

    grid = VisualizationGrid(data_root, image_size)
    maps = [np.zeros((resolution, resolution, num_classes)) for _ in range(4)]
    free = np.zeros((resolution, resolution))
    for rows, cols, images in grid.batches(batch_size):
        b = images.shape[0]
        for ori in range(4):
            if panorama:
                rolled = np.concatenate(
                    [images[:, ori:], images[:, :ori]], axis=1
                )  # (B, 4, S, S, 3)
                vals = np.asarray(score(rolled))
            else:
                vals = np.asarray(score(images[:, ori : ori + 1]))
            maps[ori][rows, cols] = vals
        free[rows, cols] = 1
    agg = np.stack(maps).max(0)
    return maps, agg, free


def crop_range(mask: np.ndarray):
    """Bounding rows/cols of the occupied region
    (the reference's util.habitat.crop_range)."""
    rows = np.where(mask.any(axis=1))[0]
    cols = np.where(mask.any(axis=0))[0]
    if len(rows) == 0:
        return (0, mask.shape[0]), (0, mask.shape[1])
    return (rows[0], rows[-1] + 1), (cols[0], cols[-1] + 1)


def render_value_map(
    value_map: np.ndarray,
    free_map: np.ndarray,
    mark_cells: Optional[List[Tuple[int, int]]] = None,
    crop: bool = True,
) -> np.ndarray:
    """Viridis heatmap (normalized over free cells), marks red, cropped.
    Returns HWC uint8."""
    import matplotlib.cm as cm
    import matplotlib.colors as mcolors

    values = value_map[free_map == 1]
    vmin = float(values.min()) if len(values) else 0.0
    vmax = float(values.max()) if len(values) else 1.0
    norm = mcolors.Normalize(vmin=vmin, vmax=vmax if vmax > vmin else vmin + 1)
    out = np.zeros(value_map.shape + (3,))
    cmap = cm.get_cmap("viridis")
    out[free_map == 1] = cmap(norm(values))[:, :3]
    for r, c in mark_cells or []:
        if 0 <= r < out.shape[0] and 0 <= c < out.shape[1]:
            out[r, c] = [1, 0, 0]
    if crop:
        (r0, r1), (c0, c1) = crop_range(free_map)
        out = out[r0:r1, c0:c1]
    return (out * 255).astype(np.uint8)


def build_map_figures(
    model, params, batch_stats, house, floor: int, data_root: str,
    panorama: bool, class_labels=None, resolution: int = 1500,
    image_size: int = 224, agent_location=None,
) -> Dict[str, np.ndarray]:
    """Per (class x direction[0-3,max]) rendered maps with goal locations
    marked — the reference's build_map_gibson output as uint8 images
    keyed 'label_direction' instead of matplotlib figures."""
    from video_dqn_tpu.sim.gibson import CLASS_LABELS, relevant_locations

    class_labels = class_labels or CLASS_LABELS
    info_path = os.path.join(data_root, "info.npy")
    if agent_location is None and os.path.exists(info_path):
        info = np.load(info_path, allow_pickle=True)[()]
        agent_location = info["agent_location"]

    maps, agg, free = build_value_maps(
        model, params, batch_stats, data_root, panorama,
        resolution=resolution, image_size=image_size,
    )
    out = {}
    for direct in [0, 1, 2, 3, "max"]:
        for i, label in enumerate(class_labels):
            marks = []
            if agent_location is not None:
                locs = relevant_locations(
                    agent_location, house.object_locations_for_habitat_dest[label]
                )
                marks = [to_grid(l, resolution) for l in locs]
            cur = agg[:, :, i] if direct == "max" else maps[direct][:, :, i]
            out[f"{label}_{direct}"] = render_value_map(cur, free, marks)
    return out


def to_grid(point, resolution: int, world_extent: float = 50.0):
    """World xz -> grid cell. The reference delegates to habitat's maps
    helper; this standalone version maps [-extent/2, extent/2) onto the
    grid, which matches habitat's default COORDINATE_MIN/MAX convention."""
    p = np.asarray(point, np.float64)
    cell = ((p[[2, 0]] + world_extent / 2) / world_extent) * resolution
    return tuple(np.clip(cell.astype(int), 0, resolution - 1))
