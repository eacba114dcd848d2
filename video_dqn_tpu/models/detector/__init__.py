"""TPU-native detector family (Mask R-CNN, ResNet-50 FPN)."""

from .boxes import (
    batched_class_nms,
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    generate_anchors,
    nms,
)
from .roi_align import multilevel_roi_align, roi_align
from .maskrcnn import FPN, BoxHead, MaskHead, MaskRCNN, RPNHead
from .convert import convert_maskrcnn
from .inference import FlaxDetector, load_detector

__all__ = [
    "batched_class_nms",
    "box_iou",
    "clip_boxes",
    "decode_boxes",
    "encode_boxes",
    "generate_anchors",
    "nms",
    "multilevel_roi_align",
    "roi_align",
    "FPN",
    "BoxHead",
    "MaskHead",
    "MaskRCNN",
    "RPNHead",
    "convert_maskrcnn",
    "FlaxDetector",
    "load_detector",
]
