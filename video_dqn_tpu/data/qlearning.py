"""Q-learning batch source: feather -> fixed-shape uint8 batches.

Capability parity with the reference QLearningRealDataset
(/root/reference/dataloaders/q_learning_real.py:27-98): per-sample
(before, after, action, reward, terminal, gt, valid_mask) with
confidence/binary reward modes, VALUE_LEARNING targets gamma^steps (NaN at
inf), inverse-action / one-action labels, and PREVIOUS_IMAGES 4-frame
history stacks clamped at im_start.

TPU-first design:
  * label math is computed ONCE, columnar, at load time (the reference
    recomputes per __getitem__ per epoch);
  * batches are uint8 NHWC at the final 224 resolution — JPEG decode uses
    PIL's DCT-domain draft mode for ~4-8x cheaper decode, final
    normalize happens on device inside the jitted train step, and the
    host->HBM transfer is 4x smaller than float32;
  * a background prefetch thread (core/prefetch.py) keeps the device fed.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np

from .schema import DETECTION_THRESHOLDS, arrays_from_frame, read_feather, validate_schema


def _load_image(path: str, size: int) -> np.ndarray:
    """Decode a JPEG to uint8 (size, size, 3): draft-mode decode, resize
    smallest edge, center crop — host half of imageNetTransformPIL."""
    from PIL import Image

    with Image.open(path) as im:
        im.draft("RGB", (size, size))
        im = im.convert("RGB")
        w, h = im.size
        if h <= w:
            nh, nw = size, max(size, int(round(size * w / h)))
        else:
            nh, nw = max(size, int(round(size * h / w))), size
        im = im.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - size) // 2, (nh - size) // 2
        return np.asarray(im.crop((left, top, left + size, top + size)), np.uint8)


class QLearningBatcher:
    """Random-batch source over a quadruplet feather."""

    def __init__(
        self,
        location: str,
        one_action: bool = False,
        value_learning: bool = False,
        inverse_actions: bool = False,
        previous_images: bool = False,
        confidence_reward: bool = False,
        gamma: float = 0.99,
        image_size: int = 224,
        seed: int = 0,
        cache_images: bool = False,
    ):
        df = read_feather(location)
        validate_schema(df)
        self.cols = arrays_from_frame(df)
        self.n = len(df)
        self.image_size = image_size
        self.previous_images = previous_images
        self.num_frames = 4 if previous_images else 1
        self._rng = np.random.default_rng(seed)
        # optional RAM cache of decoded frames: small simulator-generated
        # datasets fit in memory, removing JPEG decode from the hot loop
        self._image_cache = {} if cache_images else None

        scores = self.cols["detector_score"]  # (N, 5)
        if confidence_reward:
            self.reward = scores.astype(np.float32)
        else:
            self.reward = (scores > DETECTION_THRESHOLDS).astype(np.float32)
        # The reference returns the reward in the terminal slot in BOTH
        # modes — its computed `termainl`/`terminal` locals are discarded
        # (/root/reference/dataloaders/q_learning_real.py:76-98), so in
        # confidence mode Q_a is attenuated by (1 - confidence).
        self.terminal = self.reward
        self.valid_mask = np.ones_like(self.reward)

        steps = self.cols["steps_to_reward"]
        if value_learning:
            with np.errstate(invalid="ignore"):
                gt = np.power(gamma, steps, dtype=np.float32)
            gt[np.isinf(steps)] = np.nan
            self.gt = gt
        else:
            self.gt = np.full_like(self.reward, np.nan)

        if inverse_actions:
            if "inverse_actions" not in self.cols:
                raise ValueError("feather has no inverse_actions column")
            self.action = self.cols["inverse_actions"].astype(np.int32)
        elif one_action:
            self.action = np.zeros(self.n, np.int32)
        else:
            raise NotImplementedError("need one_action or inverse_actions")

    def __len__(self) -> int:
        return self.n

    def reward_percentage(self) -> float:
        """Fraction of samples with any-class reward
        (reference q_learning_real.py:50-52)."""
        return float((self.cols["sparse_reward"].max(axis=1) > 0).mean())

    # -- image loading ----------------------------------------------------
    def _history_paths(self, path: str, start: int):
        m = re.match(r"(.*?)(\d+)\.jpg$", path)
        prefix, im_id = m.group(1), int(m.group(2))
        width = len(m.group(2))
        ids = [max(im_id - i, start) for i in range(self.num_frames)]
        return [f"{prefix}{i:0{width}d}.jpg" for i in ids]

    def _load_stack(self, path: str, start: int) -> np.ndarray:
        if self.previous_images:
            paths = self._history_paths(path, start)
        else:
            paths = [path]
        return np.stack([self._image(p) for p in paths])

    def _image(self, path: str) -> np.ndarray:
        if self._image_cache is None:
            return _load_image(path, self.image_size)
        out = self._image_cache.get(path)
        if out is None:
            out = _load_image(path, self.image_size)
            self._image_cache[path] = out
        return out

    def get_batch(self, indices: Optional[np.ndarray] = None, batch_size: int = 16) -> Dict[str, np.ndarray]:
        if indices is None:
            indices = self._rng.integers(0, self.n, batch_size)
        before = np.stack(
            [self._load_stack(self.cols["before_image"][i], self.cols["im_start"][i]) for i in indices]
        )
        after = np.stack(
            [self._load_stack(self.cols["after_image"][i], self.cols["im_start"][i]) for i in indices]
        )
        return {
            "before": before,  # (B, F, S, S, 3) uint8
            "after": after,
            "action": self.action[indices],
            "reward": self.reward[indices],
            "terminal": self.terminal[indices],
            "gt": self.gt[indices],
            "valid_mask": self.valid_mask[indices],
        }

    def batches(self, batch_size: int):
        """Infinite shuffled batch stream (the reference's loopLoader +
        shuffle DataLoader, train_q_network.py:60-67,98)."""
        if batch_size > self.n:
            raise ValueError(
                f"batch_size {batch_size} exceeds dataset size {self.n}; "
                f"drop_last semantics would yield no batches"
            )
        while True:
            perm = self._rng.permutation(self.n)
            for i in range(0, self.n - batch_size + 1, batch_size):  # drop_last
                yield self.get_batch(perm[i : i + batch_size])
