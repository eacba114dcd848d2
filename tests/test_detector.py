"""Detector-family tests: box ops vs numpy oracles, ROIAlign vs a
bilinear-sampling oracle, NMS vs greedy reference, full Mask R-CNN smoke,
converter naming-contract coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_dqn_tpu.models.detector import (
    MaskRCNN,
    batched_class_nms,
    box_iou,
    clip_boxes,
    convert_maskrcnn,
    decode_boxes,
    encode_boxes,
    generate_anchors,
    nms,
    roi_align,
)


# ---- anchors / encode / decode --------------------------------------------

def test_anchor_grid():
    a = generate_anchors(2, 3, 16, (32,), aspect_ratios=(1.0,))
    assert a.shape == (6, 4)
    # first anchor centered at (0, 0) with ~32x32 extent
    np.testing.assert_allclose(a[0], [-16, -16, 16, 16], atol=0.01)
    # second cell shifted by the stride in x
    np.testing.assert_allclose(a[1], [0, -16, 32, 16], atol=0.01)


def test_anchor_aspect_ratios_preserve_area():
    a = generate_anchors(1, 1, 16, (64,), aspect_ratios=(0.5, 1.0, 2.0))
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(w * h, 64 * 64, rtol=1e-5)
    np.testing.assert_allclose(h[0] / w[0], 0.5, rtol=1e-5)
    np.testing.assert_allclose(h[2] / w[2], 2.0, rtol=1e-5)


def test_encode_decode_roundtrip(rng):
    anchors = jnp.asarray(rng.uniform(0, 100, (10, 4)).astype(np.float32))
    anchors = jnp.concatenate(
        [anchors[:, :2], anchors[:, :2] + 10 + anchors[:, 2:] * 0.1], axis=1
    )
    boxes = anchors + jnp.asarray(rng.uniform(-3, 3, (10, 4)).astype(np.float32))
    deltas = encode_boxes(anchors, boxes)
    back = decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-3)


def test_clip_boxes():
    b = jnp.array([[-5.0, -5.0, 300.0, 100.0]])
    np.testing.assert_array_equal(
        np.asarray(clip_boxes(b, 224, 224))[0], [0, 0, 224, 100]
    )


# ---- IoU / NMS -------------------------------------------------------------

def np_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            lt = np.maximum(x[:2], y[:2])
            rb = np.minimum(x[2:], y[2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ua = (x[2] - x[0]) * (x[3] - x[1]) + (y[2] - y[0]) * (y[3] - y[1]) - inter
            out[i, j] = inter / (ua + 1e-9)
    return out


def np_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        alive[iou[i] > thresh] = False
    return keep


def test_iou_matches_oracle(rng):
    a = rng.uniform(0, 50, (6, 2))
    a = np.concatenate([a, a + rng.uniform(5, 30, (6, 2))], 1).astype(np.float32)
    b = rng.uniform(0, 50, (4, 2))
    b = np.concatenate([b, b + rng.uniform(5, 30, (4, 2))], 1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))), np_iou(a, b),
        atol=1e-5,
    )


@pytest.mark.parametrize("seed", range(3))
def test_nms_matches_greedy_oracle(seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 60, (30, 2))
    boxes = np.concatenate([xy, xy + rng.uniform(10, 30, (30, 2))], 1).astype(np.float32)
    scores = rng.random(30).astype(np.float32)
    want = np_nms(boxes, scores, 0.5)
    keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 30)
    got = np.asarray(keep)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_batched_class_nms_separates_classes():
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8], np.float32))
    # same class: second suppressed
    keep, valid = batched_class_nms(boxes, scores, jnp.array([1, 1]), 0.5, 2)
    assert np.asarray(valid).sum() == 1
    # different classes: both survive
    keep, valid = batched_class_nms(boxes, scores, jnp.array([1, 2]), 0.5, 2)
    assert np.asarray(valid).sum() == 2


# ---- ROIAlign --------------------------------------------------------------

def np_roi_align(feat, roi, scale, out, ratio=2):
    x1, y1, x2, y2 = np.asarray(roi) * scale
    rw = max(x2 - x1, 1.0)
    rh = max(y2 - y1, 1.0)
    bh, bw = rh / out, rw / out
    res = np.zeros((out, out, feat.shape[2]))
    H, W = feat.shape[:2]

    def bil(y, x):
        y = np.clip(y, 0, H - 1)
        x = np.clip(x, 0, W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1_, x1_ = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        fy, fx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - fy) * (1 - fx)
            + feat[y0, x1_] * (1 - fy) * fx
            + feat[y1_, x0] * fy * (1 - fx)
            + feat[y1_, x1_] * fy * fx
        )

    for i in range(out):
        for j in range(out):
            acc = 0
            for si in range(ratio):
                for sj in range(ratio):
                    yy = y1 + (i + (si + 0.5) / ratio) * bh
                    xx = x1 + (j + (sj + 0.5) / ratio) * bw
                    acc = acc + bil(yy, xx)
            res[i, j] = acc / (ratio * ratio)
    return res


def test_roi_align_matches_oracle(rng):
    feat = rng.standard_normal((16, 16, 3)).astype(np.float32)
    rois = np.array([[8.0, 4.0, 40.0, 28.0], [0.0, 0.0, 64.0, 64.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25, 4))
    for r in range(2):
        want = np_roi_align(feat, rois[r], 0.25, 4)
        np.testing.assert_allclose(got[r], want, atol=1e-4)


# ---- full model smoke ------------------------------------------------------

def small_detector(**kw):
    return MaskRCNN(
        num_classes=91, dtype=jnp.float32, pre_nms_topk=50, post_nms_topk=20,
        num_proposals=16, max_detections=8, **kw,
    )


def test_maskrcnn_forward_shapes(rng):
    model = small_detector()
    img = jnp.asarray(rng.standard_normal((128, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), img)
    out = model.apply(variables, img)
    assert out["boxes"].shape == (8, 4)
    assert out["scores"].shape == (8,)
    assert out["classes"].shape == (8,)
    assert out["valid"].dtype == bool
    # boxes inside the image
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b[:, [0, 2]] <= 128).all() and (b[:, [1, 3]] <= 128).all()


def test_maskrcnn_with_masks(rng):
    model = small_detector(with_masks=True)
    img = jnp.asarray(rng.standard_normal((128, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), img)
    out = model.apply(variables, img)
    assert out["masks"].shape == (8, 28, 28)


# ---- converter naming contract --------------------------------------------

def synthetic_torchvision_sd(with_masks=True):
    """Random state_dict with torchvision maskrcnn_resnet50_fpn key naming
    (legacy flat style)."""
    rng = np.random.default_rng(0)
    sd = {}

    def add_conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)

    def add_convb(name, cin, cout, k):
        add_conv(name, cin, cout, k)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def add_bn(name, c):
        for suffix, val in [("weight", 1.0), ("bias", 0.0)]:
            sd[f"{name}.{suffix}"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.random(c).astype(np.float32) + 0.5

    def add_fc(name, cin, cout):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

    p = "backbone.body."
    add_conv(p + "conv1", 3, 64, 7)
    add_bn(p + "bn1", 64)
    widths = {1: 64, 2: 128, 3: 256, 4: 512}
    blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    cin = 64
    for s, n in blocks.items():
        w = widths[s]
        for b in range(n):
            t = f"{p}layer{s}.{b}"
            add_conv(f"{t}.conv1", cin if b == 0 else w * 4, w, 1)
            add_bn(f"{t}.bn1", w)
            add_conv(f"{t}.conv2", w, w, 3)
            add_bn(f"{t}.bn2", w)
            add_conv(f"{t}.conv3", w, w * 4, 1)
            add_bn(f"{t}.bn3", w * 4)
            if b == 0:
                add_conv(f"{t}.downsample.0", cin, w * 4, 1)
                add_bn(f"{t}.downsample.1", w * 4)
        cin = w * 4
    chans = [256, 512, 1024, 2048]
    for i in range(4):
        add_convb(f"backbone.fpn.inner_blocks.{i}", chans[i], 256, 1)
        add_convb(f"backbone.fpn.layer_blocks.{i}", 256, 256, 3)
    add_convb("rpn.head.conv", 256, 256, 3)
    add_convb("rpn.head.cls_logits", 256, 3, 1)
    add_convb("rpn.head.bbox_pred", 256, 12, 1)
    add_fc("roi_heads.box_head.fc6", 256 * 49, 1024)
    add_fc("roi_heads.box_head.fc7", 1024, 1024)
    add_fc("roi_heads.box_predictor.cls_score", 1024, 91)
    add_fc("roi_heads.box_predictor.bbox_pred", 1024, 364)
    if with_masks:
        for i in range(1, 5):
            add_convb(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
        sd["roi_heads.mask_predictor.conv5_mask.weight"] = rng.standard_normal(
            (256, 256, 2, 2)
        ).astype(np.float32)
        sd["roi_heads.mask_predictor.conv5_mask.bias"] = rng.standard_normal(256).astype(np.float32)
        add_convb("roi_heads.mask_predictor.mask_fcn_logits", 256, 91, 1)
    return sd


def test_converter_produces_loadable_params(rng):
    sd = synthetic_torchvision_sd(with_masks=True)
    params, stats = convert_maskrcnn(sd, with_masks=True)
    model = small_detector(with_masks=True)
    img = jnp.asarray(rng.standard_normal((128, 128, 3)).astype(np.float32) * 0.01)
    ref = model.init(jax.random.key(0), img)
    # converted tree must match the model's structure exactly
    want_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert want_shapes == got_shapes
    out = model.apply({"params": params, "batch_stats": stats}, img)
    assert np.isfinite(np.asarray(out["boxes"])).all()
