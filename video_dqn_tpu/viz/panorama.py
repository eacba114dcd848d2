"""Panorama strip rendering.

Capability parity with the reference join_images
(/root/reference/visualize_panorama.py:34-67): center-crop each view to
(4/N - 0.05) of its width, reverse the view order, draw a black separator
column, concatenate horizontally, and add a per-view value text row plus
bottom-left/bottom-right captions. Used by the eval visualizer
(reference evaluate.py:205-214).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def join_images(
    ims: Sequence[np.ndarray],
    values: Optional[Sequence[float]] = None,
    br_text: str = "",
    bl_text: str = "",
) -> np.ndarray:
    import cv2

    cols = ims[0].shape[1]
    scale = (4.0 / len(ims)) - 0.05
    rng = int(scale * cols / 2)

    ims = list(reversed(list(ims)))
    strips = np.array(
        [im[:, (cols // 2) - rng : (cols // 2) + rng, :] for im in ims]
    )
    strips[:, :, -1] = 0  # black separator on each view's last column
    joined = np.concatenate(strips, axis=1)
    if values is None:
        return joined

    values = list(reversed(list(values)))
    annotations = []
    for val in values:
        # uint8 from the start (cv2 >= 5 putText rejects float images)
        text = np.full((50, rng * 2, 3), 255, np.uint8)
        cv2.putText(text, f"{val:.2f}", (15, 20), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (0, 0, 0), 1)
        annotations.append(text)
    text_row = np.concatenate(annotations, axis=1)

    (tw, _), _ = cv2.getTextSize(br_text, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
    cv2.putText(text_row, br_text, (text_row.shape[1] - tw - 10, 40),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1)
    cv2.putText(text_row, bl_text, (10, 40), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                (0, 0, 0), 1)
    return np.concatenate((joined, text_row), axis=0)


def panorama_strip(env, scorer=None, num_rotations: int = 12):
    """Capture a full in-place rotation and return the annotated strip —
    the live-panorama figure core of the reference's vis_panorama
    (visualize_panorama.py:70-215, minus the pdb-interactive paper
    tooling). Returns (strip_image, per-view scores)."""
    views = []
    for _ in range(num_rotations):
        ims, _, _, _ = env.step(1)
        rgb = np.asarray(ims["rgb"])
        views.append(rgb[0] if rgb.ndim == 4 else rgb)
    scores = None
    if scorer is not None:
        scores = np.asarray(scorer(np.stack(views)))
    strip = join_images(views, None if scores is None else (-scores))
    return strip, scores
