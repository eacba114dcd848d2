"""Mask R-CNN (ResNet-50 FPN) — TPU-native detector family.

Replaces the detectron2/torchvision Mask R-CNN the reference depends on
for reward labeling and eval fusion (/root/reference/dataset/
detect_real_videos.py:30-35, /root/reference/evaluation/evaluate.py:32-39,
SURVEY.md "Native components" item 2). Inference-path implementation:

  backbone  ResNet-50 stages C2..C5 (models/resnet.ResNet50Stages)
  FPN       1x1 lateral + top-down sum + 3x3 output convs -> P2..P5,
            P6 = stride-2 subsample of P5 (RPN only)
  RPN       shared 3x3 conv + 1x1 objectness/regression heads per level;
            per-level top-k, decode, clip, NMS; merged keep-top proposals
  ROI heads ROIAlign 7x7 (FPN level assignment) -> 2xFC-1024 ->
            class scores (91 COCO classes) + per-class box deltas ->
            per-class NMS
  Mask head (optional) ROIAlign 14x14 -> 4x conv256 -> deconv -> 28x28
            per-class masks

All static shapes (padded candidate counts, fixed-iteration NMS) so the
whole detector compiles to one XLA program per image size. bf16 compute /
fp32 params. Weight converter: convert_maskrcnn maps torchvision
`maskrcnn_resnet50_fpn` state_dict naming onto this tree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from video_dqn_tpu.models.resnet import ResNet50Stages
from .boxes import (
    batched_class_nms,
    clip_boxes,
    decode_boxes,
    generate_anchors,
    nms,
)
from .roi_align import multilevel_roi_align, roi_align

Dtype = Any

STRIDES = (4, 8, 16, 32, 64)  # P2..P6
ANCHOR_SIZES = (32, 64, 128, 256, 512)
NUM_ANCHORS = 3  # aspect ratios per cell (one size per level)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)
        laterals = []
        for i, c in enumerate((c2, c3, c4, c5)):
            laterals.append(
                conv(self.out_channels, (1, 1), padding="VALID",
                     name=f"inner{i}")(c)
            )
        # top-down pathway with nearest-neighbor x2 upsampling
        p5 = laterals[3]
        p4 = laterals[2] + _upsample2(p5, laterals[2].shape)
        p3 = laterals[1] + _upsample2(p4, laterals[1].shape)
        p2 = laterals[0] + _upsample2(p3, laterals[0].shape)
        outs = []
        for i, p in enumerate((p2, p3, p4, p5)):
            outs.append(
                conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                     name=f"layer{i}")(p)
            )
        p6 = nn.max_pool(outs[3], (1, 1), strides=(2, 2))
        return (*outs, p6)


def _upsample2(x, target_shape):
    """Nearest-neighbor upsample to the lateral's spatial shape (works
    with or without a leading batch dim)."""
    shape = x.shape[:-3] + (target_shape[-3], target_shape[-2], x.shape[-1])
    return jax.image.resize(x, shape, method="nearest")


class RPNHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)
        shared = conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv")
        cls = conv(NUM_ANCHORS, (1, 1), padding="VALID", name="cls_logits")
        reg = conv(NUM_ANCHORS * 4, (1, 1), padding="VALID", name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            h = nn.relu(shared(f))
            logits.append(cls(h))
            deltas.append(reg(h))
        return logits, deltas


class BoxHead(nn.Module):
    num_classes: int = 91
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):  # (R, 7, 7, C)
        x = pooled.reshape((pooled.shape[0], -1))
        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)
        x = nn.relu(dense(1024, name="fc6")(x))
        x = nn.relu(dense(1024, name="fc7")(x))
        scores = dense(self.num_classes, name="cls_score")(x)
        deltas = dense(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


class MaskHead(nn.Module):
    num_classes: int = 91
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):  # (R, 14, 14, C)
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)
        x = pooled
        for i in range(4):
            x = nn.relu(conv(256, (3, 3), padding=((1, 1), (1, 1)),
                             name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(
            nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv5_mask")(x)
        )
        return conv(self.num_classes, (1, 1), padding="VALID",
                    name="mask_fcn_logits")(x)


class MaskRCNN(nn.Module):
    """Production defaults match torchvision maskrcnn_resnet50_fpn
    test-time semantics (the engine the reference runs,
    detect_real_videos.py:30-35): rpn_pre_nms_top_n_test=1000 per level,
    rpn_post_nms_top_n_test=1000 merged ACROSS levels, and ALL merged
    post-NMS proposals feed the ROI heads (num_proposals == post_nms_topk
    — an earlier 256 default silently truncated them; round-3 Missing #1).

    One documented static-shape deviation remains: torchvision's final
    per-class NMS consumes every candidate above box_score_thresh
    (R x 90 ~= 90k rows), which has no static bound. Here the top
    `det_candidates` (by score) enter the final NMS; with the 1000
    default, a top-100 detection can only be lost if NMS suppresses >90%
    of the 1000 best-scoring candidates first — certified at these
    defaults against the composed torch/numpy mirror in
    tests/test_detector_full_parity.py (production-HP case)."""

    num_classes: int = 91
    dtype: Dtype = jnp.float32
    with_masks: bool = False
    pre_nms_topk: int = 1000
    post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    num_proposals: int = 1000    # proposals kept into the ROI heads
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    max_detections: int = 100
    det_candidates: int = 1000   # score-ranked candidates entering final NMS

    @nn.compact
    def __call__(self, image):  # (H, W, 3) float, ImageNet-normalized
        h, w = image.shape[0], image.shape[1]
        c2, c3, c4, c5 = ResNet50Stages(dtype=self.dtype, name="body")(
            image[None], train=False
        )
        feats = FPN(dtype=self.dtype, name="fpn")(c2, c3, c4, c5)
        feats = tuple(f[0] for f in feats)  # drop batch dim
        logits, deltas = RPNHead(dtype=self.dtype, name="rpn_head")(feats)

        # --- proposals ---------------------------------------------------
        all_boxes, all_scores = [], []
        for lvl, (lg, dl) in enumerate(zip(logits, deltas)):
            fh, fw = lg.shape[0], lg.shape[1]
            anchors = jnp.asarray(
                generate_anchors(fh, fw, STRIDES[lvl], (ANCHOR_SIZES[lvl],))
            )
            score = lg.reshape(-1)
            delta = dl.reshape(-1, 4)
            k = min(self.pre_nms_topk, score.shape[0])
            top_s, top_i = jax.lax.top_k(score, k)
            boxes = decode_boxes(anchors[top_i], delta[top_i])
            boxes = clip_boxes(boxes, h, w)
            keep, valid = nms(boxes, top_s, self.rpn_nms_thresh,
                              min(self.post_nms_topk, k))
            all_boxes.append(jnp.where(valid[:, None], boxes[keep], 0.0))
            all_scores.append(jnp.where(valid, top_s[keep], -jnp.inf))
        proposals = jnp.concatenate(all_boxes)
        pscores = jnp.concatenate(all_scores)
        k = min(self.num_proposals, pscores.shape[0])
        _, idx = jax.lax.top_k(pscores, k)
        proposals = proposals[idx]

        # --- box head ----------------------------------------------------
        pooled = multilevel_roi_align(feats[:4], proposals, STRIDES[:4], 7)
        scores, bdeltas = BoxHead(self.num_classes, dtype=self.dtype,
                                  name="box_head")(pooled)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

        # per-class decode (skip background class 0)
        R = proposals.shape[0]
        C = self.num_classes
        bdeltas = bdeltas.reshape(R, C, 4)
        cls_ids = jnp.arange(1, C)
        # flatten (R, C-1) candidates
        cand_scores = probs[:, 1:].reshape(-1)
        cand_classes = jnp.broadcast_to(cls_ids[None, :], (R, C - 1)).reshape(-1)
        cand_deltas = bdeltas[:, 1:].reshape(-1, 4)
        cand_anchors = jnp.repeat(proposals, C - 1, axis=0)
        cand_boxes = decode_boxes(cand_anchors, cand_deltas,
                                  weights=(10.0, 10.0, 5.0, 5.0))
        cand_boxes = clip_boxes(cand_boxes, h, w)
        cand_scores = jnp.where(cand_scores > self.box_score_thresh,
                                cand_scores, -jnp.inf)
        # bounded candidate set before the final NMS (see class docstring:
        # torchvision takes all ~R*90 above-threshold rows; static shapes
        # need a bound, det_candidates=1000 by default)
        k2 = min(self.det_candidates, cand_scores.shape[0])
        top_s, top_i = jax.lax.top_k(cand_scores, k2)
        keep, valid = batched_class_nms(
            cand_boxes[top_i], top_s, cand_classes[top_i],
            self.box_nms_thresh, self.max_detections,
        )
        det_boxes = cand_boxes[top_i][keep]
        det_scores = jnp.where(valid, top_s[keep], 0.0)
        det_classes = jnp.where(valid, cand_classes[top_i][keep], 0)
        det_boxes = jnp.where(valid[:, None], det_boxes, 0.0)

        out = {
            "boxes": det_boxes,
            "scores": det_scores,
            "classes": det_classes,
            "valid": valid,
        }
        if self.with_masks:
            mp = multilevel_roi_align(feats[:4], det_boxes, STRIDES[:4], 14)
            mlogits = MaskHead(self.num_classes, dtype=self.dtype,
                               name="mask_head")(mp)
            midx = jnp.arange(det_boxes.shape[0])
            out["masks"] = jax.nn.sigmoid(
                mlogits[midx, :, :, det_classes]
            )
        return out
