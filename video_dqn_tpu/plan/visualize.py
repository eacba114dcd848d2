"""Episode visualization: per-step rgb|depth|map frame buffers and mp4/png
assembly.

Capability parity with the reference's visualization ring buffers and
write_combined (/root/reference/evaluation/slam.py:396-514): map rendering
with trajectory/reasoning/open-list overlays, frame stacking, mp4 via
imageio when available (png fallback otherwise). Rendering uses plain
numpy drawing instead of a matplotlib figure per frame (the reference
spins up a full pyplot figure per step — :431-463)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def render_map_rgb(planner, scale: int = 1) -> np.ndarray:
    """Obstacle map with trajectory overlay as an HWC uint8 image
    (origin lower, like the reference's imshow(origin='lower'))."""
    obstacle = planner.map[:, :, 1] > planner.point_cnt
    h, w = obstacle.shape
    img = np.full((h, w, 3), 255, np.uint8)
    img[obstacle] = (53, 166, 85)  # reference's light green obstacle color

    def mark(loc_cm, color, size=1):
        cell = planner.loc_to_map(loc_cm)
        y, x = int(cell[0]), int(cell[1])
        y0, y1 = max(0, y - size), min(h, y + size + 1)
        x0, x1 = max(0, x - size), min(w, x + size + 1)
        img[y0:y1, x0:x1] = color

    for loc in planner.locs:
        mark(loc, (0, 0, 0), 0)
    for loc in planner.reasoning_locs:
        mark(loc, (0, 0, 0), 1)
    if planner.current_open:
        for _, pos in planner.current_open:
            mark(planner.pos_to_loc(pos), (28, 164, 252), 1)
    if planner.goal_loc is not None:
        mark(planner.goal_loc, (255, 0, 0), 2)
    return img[::-1]  # origin='lower'


def log_frame(planner, obs, action: int) -> None:
    """Append the current rgb/depth/map (rotations log 2 frames,
    reference slam.py:296-311)."""
    rgb = np.asarray(obs["rgb"]).astype(np.uint8)
    depth = np.asarray(obs["depth"])
    if rgb.ndim == 4:
        rgb = rgb[0]
    if depth.ndim == 4:
        depth = depth[0]
    d8 = (np.clip(depth[..., 0], 0, 1) * 255).astype(np.uint8)
    frames = 2 if action in (1, 2) else 1
    for _ in range(frames):
        planner.rgbs.append(rgb)
        planner.depths.append(d8)
        planner.maps.append(render_map_rgb(planner))
        planner.pans.append(planner.current_pan)


def _fit(img: np.ndarray, h: int) -> np.ndarray:
    """Nearest-neighbor resize to height h preserving aspect."""
    ih, iw = img.shape[:2]
    w = max(1, int(round(iw * h / ih)))
    ys = (np.arange(h) * ih // h).clip(0, ih - 1)
    xs = (np.arange(w) * iw // w).clip(0, iw - 1)
    return img[ys][:, xs]


def write_combined(planner, out_dir: str, name: str = "episode", fps: int = 6) -> Optional[str]:
    """Assemble rgb|depth|map strips into an mp4 (imageio) or a stacked
    png fallback. Returns the written path."""
    if not planner.rgbs:
        return None
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for rgb, d8, mp in zip(planner.rgbs, planner.depths, planner.maps):
        h = rgb.shape[0]
        depth_rgb = np.repeat(d8[..., None], 3, axis=-1)
        strip = np.concatenate(
            [rgb, _fit(depth_rgb, h), _fit(mp, h)], axis=1
        )
        frames.append(strip)
    path = os.path.join(out_dir, f"{name}.mp4")
    try:
        import imageio

        with imageio.get_writer(path, fps=fps) as w:
            for f in frames:
                w.append_data(f)
        return path
    except Exception:
        png = os.path.join(out_dir, f"{name}.png")
        from PIL import Image

        Image.fromarray(frames[-1]).save(png)
        return png
