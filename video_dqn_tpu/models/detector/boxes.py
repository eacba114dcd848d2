"""Box utilities for the detector: anchors, encode/decode, IoU, and a
jittable fixed-shape NMS.

TPU-native replacements for detectron2/torchvision's CUDA box ops (the
reference's reward labeler depends on them — SURVEY.md section 2 "Native
components" item 2): everything here is static-shape XLA — NMS is an
iterative argmax/suppress lax.fori_loop over a fixed candidate count
instead of a dynamic CUDA kernel.

Box convention: (x1, y1, x2, y2) in image pixels.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def generate_anchors(
    feat_h: int,
    feat_w: int,
    stride: int,
    sizes: Sequence[float],
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """(H*W*A, 4) anchors centered on the feature grid (torchvision
    AnchorGenerator semantics: zero-centered cell anchors of the given
    sqrt-area sizes and h/w ratios, shifted by stride)."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            h = np.sqrt(area * ar)
            w = area / h
            cell.append([-w / 2, -h / 2, w / 2, h / 2])
    cell = np.array(cell)  # (A, 4)
    xs = (np.arange(feat_w) + 0.0) * stride
    ys = (np.arange(feat_h) + 0.0) * stride
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack(
        [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()], 1
    )  # (H*W, 4)
    anchors = shifts[:, None, :] + cell[None, :, :]
    return anchors.reshape(-1, 4).astype(np.float32)


@jax.jit
def decode_boxes(anchors: jax.Array, deltas: jax.Array,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """Apply (dx, dy, dw, dh) regression deltas (R-CNN parameterization)."""
    wx, wy, ww, wh = weights
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    dx, dy, dw, dh = [deltas[:, i] / w for i, w in enumerate((wx, wy, ww, wh))]
    # clamp dw/dh like torchvision (log(1000/16))
    clamp = np.log(1000.0 / 16)
    dw = jnp.clip(dw, max=clamp)
    dh = jnp.clip(dh, max=clamp)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


@jax.jit
def encode_boxes(anchors: jax.Array, boxes: jax.Array) -> jax.Array:
    """Inverse of decode_boxes (used for training targets)."""
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    bx = (boxes[:, 0] + boxes[:, 2]) / 2
    by = (boxes[:, 1] + boxes[:, 3]) / 2
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    return jnp.stack(
        [(bx - ax) / aw, (by - ay) / ah, jnp.log(bw / aw), jnp.log(bh / ah)],
        axis=1,
    )


@jax.jit
def clip_boxes(boxes: jax.Array, height, width) -> jax.Array:
    return jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, width),
            jnp.clip(boxes[:, 1], 0, height),
            jnp.clip(boxes[:, 2], 0, width),
            jnp.clip(boxes[:, 3], 0, height),
        ],
        axis=1,
    )


@jax.jit
def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 4) x (M, 4) -> (N, M) IoU matrix."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


@partial(jax.jit, static_argnums=(3,))
def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
        max_out: int) -> Tuple[jax.Array, jax.Array]:
    """Fixed-shape NMS: returns (keep_indices (max_out,), valid (max_out,))
    — indices of kept boxes in score order, padded with 0s where invalid.

    lax.fori_loop of argmax + IoU suppression: static shapes, no host
    sync, vmappable — the XLA-native shape of the CUDA NMS kernel."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        alive, keep, valid = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        keep = keep.at[i].set(jnp.where(ok, best, 0))
        valid = valid.at[i].set(ok)
        # drop the winner (self-IoU = 1) and everything it overlaps
        suppress = iou[best] > iou_threshold
        suppress = suppress | (jnp.arange(n) == best)
        alive = jnp.where(ok, alive & ~suppress, alive)
        return alive, keep, valid

    alive = jnp.ones(n, bool)
    keep = jnp.zeros(max_out, jnp.int32)
    valid = jnp.zeros(max_out, bool)
    alive, keep, valid = jax.lax.fori_loop(0, max_out, body, (alive, keep, valid))
    return keep, valid


@partial(jax.jit, static_argnums=(4,))
def batched_class_nms(boxes, scores, classes, iou_threshold, max_out):
    """Per-class NMS via the coordinate-offset trick (torchvision
    batched_nms): shift each class's boxes to a disjoint region so one NMS
    pass suppresses only within-class overlaps."""
    offset = classes.astype(boxes.dtype)[:, None] * (boxes.max() + 1.0)
    return nms(boxes + offset, scores, iou_threshold, max_out)
