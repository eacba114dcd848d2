"""Reward-detection pass: run an object detector over every extracted
frame, recording per-frame (boxes, scores) for the 5 target classes.

Capability parity with /root/reference/dataset/detect_real_videos.py:26-77:
per frame a (5, 2) object array [class -> (boxes (N,4), scores (N,))],
batched inference, all videos merged into one
`frames/real_detections_raw.npy` dict {vid: {frame_id: (5,2) array}}.
(The reference file also carries broken imports, :15,20 — documented in
SURVEY.md as a quirk, not replicated.)

The detector is injectable: `detector(images_uint8) -> list per image of
dict(boxes (N,4), scores (N,), classes (N,))` with COCO class indices.
models/detector.py provides the Flax implementation; StubDetector here
supports tests and pipeline dry-runs.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict, List

import numpy as np

# torchvision-style COCO indices of the 5 sorted target classes
# ['bed','chair','couch','dining table','toilet']
COCO_TARGET_IDS = {"bed": 65, "chair": 62, "couch": 63, "dining table": 67, "toilet": 70}
TARGET_CLASSES = sorted(COCO_TARGET_IDS.keys())


def detections_to_class_array(det: Dict) -> np.ndarray:
    """One image's detector output -> (5, 2) object array of
    (boxes, scores) per target class (score-sorted within class)."""
    boxes = np.asarray(det["boxes"], np.float32).reshape(-1, 4)
    scores = np.asarray(det["scores"], np.float32)
    classes = np.asarray(det["classes"], np.int64)
    out = np.empty((len(TARGET_CLASSES), 2), object)
    for ci, cname in enumerate(TARGET_CLASSES):
        mask = classes == COCO_TARGET_IDS[cname]
        if mask.any():
            order = np.argsort(-scores[mask])
            out[ci, 0] = boxes[mask][order]
            out[ci, 1] = scores[mask][order]
        else:
            out[ci, 0] = None
            out[ci, 1] = None
    return out


def score_vals(class_array: np.ndarray) -> np.ndarray:
    """(5, 2) class array -> (5,) max score per class, 0 when none
    (reference detect/process `score_detections`, process_episodes_real.py:25-27)."""
    out = np.zeros(len(class_array), np.float64)
    for i, s in enumerate(class_array[:, 1]):
        if s is not None and len(s):
            out[i] = float(np.max(s))
    return out


def run_detection_pass(
    frames_root: str,
    detector: Callable,
    out_path: str = None,
    batch_size: int = 4,
    image_size: int = 224,
) -> Dict[str, Dict[int, np.ndarray]]:
    """Detect over frames/<vid>/%04d.jpg; returns and optionally saves
    {vid: {frame_id: (5,2) class array}}."""
    from .qlearning import load_images

    results: Dict[str, Dict[int, np.ndarray]] = {}
    for vid in sorted(os.listdir(frames_root)):
        folder = os.path.join(frames_root, vid)
        if not os.path.isdir(folder):
            continue
        files = sorted(
            f for f in os.listdir(folder) if re.fullmatch(r"\d+\.jpg", f)
        )
        per_video: Dict[int, np.ndarray] = {}
        for i in range(0, len(files), batch_size):
            chunk = files[i : i + batch_size]
            images = load_images(
                [os.path.join(folder, f) for f in chunk], image_size
            )
            dets = detector(images)
            for fname, det in zip(chunk, dets):
                frame_id = int(fname.split(".")[0])
                per_video[frame_id] = detections_to_class_array(det)
        results[vid] = per_video
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.save(out_path, results, allow_pickle=True)
    return results


class StubDetector:
    """Deterministic synthetic detector for tests/dry-runs: emits
    above-threshold detections of the target classes with probability
    `hit_rate` per image, keyed on image content hash."""

    def __init__(self, hit_rate: float = 0.15, seed: int = 0):
        self.hit_rate = hit_rate
        self.seed = seed
        self.calls = 0  # one call per fused reasoning stop (see
        # models/detector/inference.FlaxDetector.calls)

    def __call__(self, images, class_label: str = None) -> List[Dict]:
        self.calls += 1
        if class_label is not None:
            # eval-fusion contract (one image, one class -> boxes, scores;
            # reference evaluate.py:117-134 / models/detector/inference.py)
            det = self._detect([np.asarray(images)])[0]
            mask = det["classes"] == COCO_TARGET_IDS[class_label]
            return det["boxes"][mask], det["scores"][mask]
        return self._detect(np.asarray(images))

    def _detect(self, images) -> List[Dict]:
        out = []
        for im in np.asarray(images):
            h = int(np.asarray(im, np.uint64).sum() + self.seed) % (2**32)
            rng = np.random.default_rng(h)
            boxes, scores, classes = [], [], []
            for cname, cid in COCO_TARGET_IDS.items():
                if rng.random() < self.hit_rate:
                    boxes.append(rng.uniform(0, im.shape[1], 4))
                    scores.append(rng.uniform(0.95, 1.0))
                    classes.append(cid)
                elif rng.random() < 0.5:
                    boxes.append(rng.uniform(0, im.shape[1], 4))
                    scores.append(rng.uniform(0.1, 0.5))
                    classes.append(cid)
            out.append(
                {
                    "boxes": np.array(boxes, np.float32).reshape(-1, 4),
                    "scores": np.array(scores, np.float32),
                    "classes": np.array(classes, np.int64),
                }
            )
        return out
