"""Synthetic dataset fixtures: tiny JPEG frame trees + quadruplet feathers
with the exact reference schema. Used by tests and the train-smoke
benchmark (BASELINE.json config #1: "Q-net train smoke ... 1k-quadruplet
slice"), standing in for the 1,405-video YouTube pipeline output.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

from .schema import DETECTION_THRESHOLDS, multi_add, write_feather
from video_dqn_tpu.ops.scans import label_video_host


def make_synthetic_dataset(
    root: str,
    num_videos: int = 2,
    frames_per_video: int = 24,
    image_size: int = 96,
    num_classes: int = 5,
    seed: int = 0,
    stride: int = 3,
) -> str:
    """Write frames/<vid>/%04d.jpg + data.feather under `root`.
    Returns the feather path."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    rows = []
    all_scores, all_actions = [], []
    for v in range(num_videos):
        vid = f"vid{v:03d}"
        fdir = os.path.join(root, "frames", vid)
        os.makedirs(fdir, exist_ok=True)
        for i in range(1, frames_per_video + 1):
            arr = rng.integers(0, 256, (image_size, image_size, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(fdir, f"{i:04d}.jpg"))
        # detector scores: mostly low, occasional above-threshold spikes
        scores = rng.random((frames_per_video, num_classes)) * 0.6
        spikes = rng.random((frames_per_video, num_classes)) < 0.1
        scores[spikes] = 0.98
        start, stop = 1, frames_per_video + 1
        for i in range(start, stop - stride):
            rows.append(
                (
                    os.path.join(fdir, f"{i:04d}.jpg"),
                    os.path.join(fdir, f"{i + stride:04d}.jpg"),
                    vid,
                    start,
                    stop,
                )
            )
            all_scores.append(scores[i + stride - 1])
            all_actions.append(rng.integers(0, 3))

    df = pd.DataFrame(
        rows, columns=["before_image", "after_image", "ep_id", "im_start", "im_stop"]
    )
    ds = np.stack(all_scores)
    multi_add(df, ds, "detector_score")
    sparse = (ds > DETECTION_THRESHOLDS).astype(np.int64)
    multi_add(df, sparse, "sparse_reward")
    fwd, neg = label_video_host(sparse)
    multi_add(df, fwd, "steps_to_reward")
    multi_add(df, neg, "steps_to_reward_neg")
    df["inverse_actions"] = np.array(all_actions, np.int64)
    path = os.path.join(root, "data.feather")
    write_feather(df, path)
    return path


def synthetic_batch(
    batch_size: int = 16,
    num_frames: int = 1,
    image_size: int = 224,
    num_classes: int = 5,
    seed: int = 0,
):
    """Pure in-memory batch (no disk) for compile checks and kernel benches."""
    rng = np.random.default_rng(seed)
    return {
        "before": rng.integers(0, 256, (batch_size, num_frames, image_size, image_size, 3), dtype=np.uint8),
        "after": rng.integers(0, 256, (batch_size, num_frames, image_size, image_size, 3), dtype=np.uint8),
        "action": rng.integers(0, 3, batch_size).astype(np.int32),
        "reward": (rng.random((batch_size, num_classes)) < 0.1).astype(np.float32),
        "terminal": (rng.random((batch_size, num_classes)) < 0.1).astype(np.float32),
        "gt": rng.random((batch_size, num_classes)).astype(np.float32),
        "valid_mask": np.ones((batch_size, num_classes), np.float32),
    }
