"""Panorama strip rendering and value/distance analysis.

Capability parity with the reference join_images
(/root/reference/visualize_panorama.py:34-67): center-crop each view to
(4/N - 0.05) of its width, reverse the view order, draw a black separator
column, concatenate horizontally, and add a per-view value text row plus
bottom-left/bottom-right captions. Used by the eval visualizer
(reference evaluate.py:205-214).

vis_panorama is the reference's value/distance correlation analysis
(visualize_panorama.py:70-215): rotate in place, score every view with
the model for all 5 classes, take one forward step per heading to measure
how much each class's geodesic distance-to-goal DROPS in that direction,
and report (figure, per-class corr(value, distance-drop)) — the paper's
"does the learned value point toward the object" diagnostic. The
reference's interactive figure-height bisection and pdb breakpoints
(:120-137,203) are paper-session scaffolding, not replicated. TPU-first
difference: all N views are scored in ONE batched device call instead of
N sequential forwards (:91-95).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


# Pixel-layout contract of the reference's episode-video strips
# (/root/reference/visualize_panorama.py:34-67), pinned by the golden-pixel
# test (tests/test_viz_utils.py / tests/data/join_images_golden.npz) so the
# committed video artifacts stay byte-stable:
#   * each view contributes a centered crop whose width is (4/N - 0.05) of
#     the source width (~4 views' worth of pixels spread over all N, minus
#     a 5% trim), rounded via int();
#   * the strip runs RIGHT-TO-LEFT (view N-1 first) — a left turn between
#     consecutive views then reads left-to-right across the panorama;
#   * the last column of every crop is blacked out as a separator;
#   * the optional caption row is 50 px of white below the strip: one
#     "%.2f" value per view (clipped to its own crop width), bl_text
#     bottom-left, br_text right-aligned bottom-right, all HERSHEY_SIMPLEX
#     at 0.5 / thickness 1.
_CAPTION_H = 50
_FONT_SCALE = 0.5


def _caption_tile(width: int, text: str, org) -> np.ndarray:
    """White uint8 tile with `text` drawn at `org` (cv2 clips at the tile
    edge, so one tile per view keeps long values from bleeding into the
    neighbor's cell)."""
    import cv2

    tile = np.full((_CAPTION_H, width, 3), 255, np.uint8)
    cv2.putText(tile, text, org, cv2.FONT_HERSHEY_SIMPLEX, _FONT_SCALE,
                (0, 0, 0), 1)
    return tile


def join_images(
    ims: Sequence[np.ndarray],
    values: Optional[Sequence[float]] = None,
    br_text: str = "",
    bl_text: str = "",
) -> np.ndarray:
    import cv2

    views = list(ims)[::-1]
    n = len(views)
    src_w = views[0].shape[1]
    half = int(((4.0 / n) - 0.05) * src_w / 2)
    crop_w = 2 * half
    center = src_w // 2

    strip = np.concatenate(
        [v[:, center - half : center + half] for v in views], axis=1
    ).copy()
    strip[:, crop_w - 1 :: crop_w] = 0  # per-view separator columns
    if values is None:
        return strip

    caption = np.concatenate(
        [_caption_tile(crop_w, f"{v:.2f}", (15, 20))
         for v in reversed(list(values))],
        axis=1,
    )
    (bw, _), _ = cv2.getTextSize(br_text, cv2.FONT_HERSHEY_SIMPLEX,
                                 _FONT_SCALE, 1)
    cv2.putText(caption, br_text, (caption.shape[1] - bw - 10, 40),
                cv2.FONT_HERSHEY_SIMPLEX, _FONT_SCALE, (0, 0, 0), 1)
    cv2.putText(caption, bl_text, (10, 40), cv2.FONT_HERSHEY_SIMPLEX,
                _FONT_SCALE, (0, 0, 0), 1)
    return np.concatenate((strip, caption), axis=0)


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


def min_dists(env, goals_by_class, point=None) -> np.ndarray:
    """Per-class min geodesic distance from `point` (default: the agent)
    to each class's goal list (reference visualize_panorama.py:21-30);
    inf for classes with no goals."""
    if point is None:
        point = env.agent_state()[0]
    out = []
    for goals in goals_by_class:
        if len(goals) == 0:
            out.append(float("inf"))
        else:
            out.append(min(env.geodesic_distance(point, g) for g in goals))
    return np.array(out, np.float64)


def make_allclass_scorer(model, params, batch_stats, image_size: int = 224):
    """(V, H, W, 3) or (V, F, H, W, 3) uint8 -> (V, C) max-over-actions Q
    for EVERY class in one jitted forward (the reference's vis_panorama
    runs one forward per view, visualize_panorama.py:91-95)."""
    import jax
    import jax.numpy as jnp

    from video_dqn_tpu.ops.image import normalize_imagenet
    from video_dqn_tpu.ops.pallas_image import fused_preprocess

    @jax.jit
    def run(images):
        v, f = images.shape[0], images.shape[1]
        if images.shape[2] == image_size and images.shape[3] == image_size:
            x = normalize_imagenet(images.astype(jnp.float32) / 255.0)
        else:
            flat = images.reshape((v * f,) + images.shape[2:])
            x = fused_preprocess(flat, image_size)
            x = x.reshape((v, f, image_size, image_size, 3))
        q = model.apply({"params": params, "batch_stats": batch_stats}, x, False)
        return q.max(axis=-1)  # (V, C)

    def scorer(images_uint8):
        x = np.asarray(images_uint8)
        if x.ndim == 4:
            x = x[:, None]
        return np.asarray(run(x))

    return scorer


def vis_panorama(
    env,
    scorer_all,
    goals_by_class,
    num: int = 12,
    log: bool = False,
    class_names: Optional[Sequence[str]] = None,
    out_path: Optional[str] = None,
    probe_steps: int = 1,
):
    """Value/distance correlation analysis at the agent's current pose
    (reference visualize_panorama.py:70-215).

    For each of `num` evenly-spaced headings: render the view, take
    `probe_steps` forward steps from that heading (the reference takes
    one, :96; envs whose geodesic is cell-quantized — FakeNavEnv's 0.5 m
    grid vs the 0.25 m step — need >= 2 to register motion), and record
    per-class
    dist_diff = dists(start) - dists(after-step) — positive means that
    heading moves toward the class. All views are scored in one
    `scorer_all` call -> (num, C) values (log-scaled when `log`). Returns
    (figure, corrs) where corrs[c] = corrcoef(values[:, c],
    dist_diff[:, c]) over the headings (reference :209-213); the figure is
    the panorama strip over C 'Wistia' value rows with per-cell numbers
    (:151-186). The agent is restored to its initial state (:205-206).
    """
    import math

    pos, rot = env.agent_state()
    n_classes = len(goals_by_class)
    base_dists = min_dists(env, goals_by_class, pos)

    views, dist_diffs = [], []
    for k in range(num):
        ang = rot + 2.0 * math.pi * k / num
        env.set_agent_state(pos, ang)
        obs = env.get_observation()
        rgb = np.asarray(obs["rgb"])
        views.append(rgb[0] if rgb.ndim == 4 else rgb)
        for _ in range(probe_steps):  # forward probe (reference :96)
            env.step(0)
        dist_diffs.append(base_dists - min_dists(env, goals_by_class))
        env.set_agent_state(pos, ang)  # undo the probe steps
    env.set_agent_state(pos, rot)

    values = np.asarray(scorer_all(np.stack(views)), np.float64)  # (num, C)
    assert values.shape == (num, n_classes), values.shape
    if log:
        values = np.log(values)
    dist_diffs = np.stack(dist_diffs)  # (num, C)

    corrs = np.full(n_classes, np.nan)
    for c in range(n_classes):
        d = dist_diffs[:, c]
        v = values[:, c]
        if np.all(np.isfinite(d)) and d.std() > 0 and v.std() > 0:
            corrs[c] = float(np.corrcoef(v, d)[0, 1])

    # figure: strip on top, one value row per class (reference :103-186,
    # minus the interactive height bisection)
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    # reversed view order matches join_images / the reference strip
    joined = join_images(views)
    vals_rows = values[::-1].T  # (C, num), reversed like the strip
    fig, axes = plt.subplots(
        1 + n_classes,
        1,
        gridspec_kw={
            "hspace": 0,
            "wspace": 0,
            "height_ratios": [6] + [0.5] * n_classes,
        },
        figsize=(12, 8),
    )
    axes[0].imshow(joined)
    axes[0].set_xticks([])
    axes[0].set_yticks([])
    names = list(class_names) if class_names else [""] * n_classes
    for ax, row, name, corr in zip(axes[1:], vals_rows, names, corrs):
        ax.imshow(row[None, :], extent=[0, num, 0, 1], aspect="auto",
                  cmap="Wistia")
        ax.set_xlim((0, num))
        ax.set_ylim((0, 1))
        for i, v in enumerate(row):
            ax.text(i + 0.5, 0.45, f"{v:.2f}", fontsize=9,
                    horizontalalignment="center", verticalalignment="center")
        label = name
        if np.isfinite(corr):
            label = f"{name} r={corr:.2f}" if name else f"r={corr:.2f}"
        if label:
            ax.set_ylabel(label, rotation=0, ha="right", va="center",
                          fontsize=9)
        ax.set_xticks([])
        ax.set_yticks([])
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", pad_inches=0.0)
    return fig, corrs
