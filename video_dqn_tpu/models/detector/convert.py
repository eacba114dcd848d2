"""torchvision maskrcnn_resnet50_fpn state_dict -> MaskRCNN param tree.

Supports both the legacy flat FPN/RPN naming (torchvision < 0.13:
`backbone.fpn.inner_blocks.0.weight`) and the Conv2dNormActivation naming
(>= 0.13: `...inner_blocks.0.0.weight`, `rpn.head.conv.0.0.weight`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from video_dqn_tpu.models.torch_convert import _np, conv_kernel, dense_kernel


def _bn(sd, prefix):
    return (
        {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])},
    )


def _convdt(w) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out)."""
    return _np(w).transpose(2, 3, 0, 1)


def _get(sd, *names):
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(names[0])


def convert_resnet50_stages(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params: Dict = {"conv1": {"kernel": conv_kernel(sd[f"{prefix}conv1.weight"])}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}bn1")
    blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    for stage, n in blocks.items():
        for b in range(n):
            t = f"{prefix}layer{stage}.{b}"
            name = f"layer{stage}_{b}"
            bp, bs = {}, {}
            for c in (1, 2, 3):
                bp[f"conv{c}"] = {"kernel": conv_kernel(sd[f"{t}.conv{c}.weight"])}
                bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv_kernel(sd[f"{t}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = _bn(sd, f"{t}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


def convert_maskrcnn(sd: Dict, with_masks: bool = False) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) for models.detector.MaskRCNN."""
    body_p, body_s = convert_resnet50_stages(sd, "backbone.body.")
    params: Dict = {"body": body_p}
    stats: Dict = {"body": body_s}

    fpn: Dict = {}
    for i in range(4):
        wi = _get(sd, f"backbone.fpn.inner_blocks.{i}.weight",
                  f"backbone.fpn.inner_blocks.{i}.0.weight")
        bi = _get(sd, f"backbone.fpn.inner_blocks.{i}.bias",
                  f"backbone.fpn.inner_blocks.{i}.0.bias")
        wl = _get(sd, f"backbone.fpn.layer_blocks.{i}.weight",
                  f"backbone.fpn.layer_blocks.{i}.0.weight")
        bl = _get(sd, f"backbone.fpn.layer_blocks.{i}.bias",
                  f"backbone.fpn.layer_blocks.{i}.0.bias")
        fpn[f"inner{i}"] = {"kernel": conv_kernel(wi), "bias": _np(bi)}
        fpn[f"layer{i}"] = {"kernel": conv_kernel(wl), "bias": _np(bl)}
    params["fpn"] = fpn

    params["rpn_head"] = {
        "conv": {
            "kernel": conv_kernel(_get(sd, "rpn.head.conv.weight",
                                       "rpn.head.conv.0.0.weight")),
            "bias": _np(_get(sd, "rpn.head.conv.bias", "rpn.head.conv.0.0.bias")),
        },
        "cls_logits": {
            "kernel": conv_kernel(sd["rpn.head.cls_logits.weight"]),
            "bias": _np(sd["rpn.head.cls_logits.bias"]),
        },
        "bbox_pred": {
            "kernel": conv_kernel(sd["rpn.head.bbox_pred.weight"]),
            "bias": _np(sd["rpn.head.bbox_pred.bias"]),
        },
    }

    # box head: fc6 consumes the flattened 7x7x256 pool — reorder CHW->HWC
    from video_dqn_tpu.models.torch_convert import dense_kernel_chw

    params["box_head"] = {
        "fc6": {
            "kernel": dense_kernel_chw(sd["roi_heads.box_head.fc6.weight"], 256, 7, 7),
            "bias": _np(sd["roi_heads.box_head.fc6.bias"]),
        },
        "fc7": {
            "kernel": dense_kernel(sd["roi_heads.box_head.fc7.weight"]),
            "bias": _np(sd["roi_heads.box_head.fc7.bias"]),
        },
        "cls_score": {
            "kernel": dense_kernel(sd["roi_heads.box_predictor.cls_score.weight"]),
            "bias": _np(sd["roi_heads.box_predictor.cls_score.bias"]),
        },
        "bbox_pred": {
            "kernel": dense_kernel(sd["roi_heads.box_predictor.bbox_pred.weight"]),
            "bias": _np(sd["roi_heads.box_predictor.bbox_pred.bias"]),
        },
    }

    if with_masks:
        mh: Dict = {}
        for i in range(1, 5):
            w = _get(sd, f"roi_heads.mask_head.mask_fcn{i}.weight",
                     f"roi_heads.mask_head.{i - 1}.0.weight")
            b = _get(sd, f"roi_heads.mask_head.mask_fcn{i}.bias",
                     f"roi_heads.mask_head.{i - 1}.0.bias")
            mh[f"mask_fcn{i}"] = {"kernel": conv_kernel(w), "bias": _np(b)}
        mh["conv5_mask"] = {
            "kernel": _convdt(sd["roi_heads.mask_predictor.conv5_mask.weight"]),
            "bias": _np(sd["roi_heads.mask_predictor.conv5_mask.bias"]),
        }
        mh["mask_fcn_logits"] = {
            "kernel": conv_kernel(sd["roi_heads.mask_predictor.mask_fcn_logits.weight"]),
            "bias": _np(sd["roi_heads.mask_predictor.mask_fcn_logits.bias"]),
        }
        params["mask_head"] = mh
    return params, stats
