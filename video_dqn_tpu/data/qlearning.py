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


def load_images(paths, size: int, native: Optional[bool] = None) -> np.ndarray:
    """Batched decode: list of JPEG paths -> (N, size, size, 3) uint8.

    Uses the native threaded batch stage (native/decode/jpeg.cc — one C
    call for the whole batch, no per-image Python dispatch) when the
    library is available, with the PIL twin `_load_image` as per-image
    fallback for files the native decoder rejects (non-JPEG, progressive
    variants, ...). native=False forces the PIL path (the test oracle);
    native=None auto-detects (overridable with VDQN_NATIVE_JPEG=0)."""
    paths = list(paths)
    if not paths:
        return np.empty((0, size, size, 3), np.uint8)
    if native is None and os.environ.get("VDQN_NATIVE_JPEG", "1") == "0":
        native = False
    if native is None or native:
        from . import native_decode

        if native_decode.available():
            out, failed = native_decode.jpeg_batch(paths, size)
            for i in failed:
                out[i] = _load_image(paths[i], size)
            return out
        if native:
            raise RuntimeError("native JPEG decode requested but unavailable")
    return np.stack([_load_image(p, size) for p in paths])


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
        cache_bytes: Optional[int] = None,
    ):
        df = read_feather(location)
        validate_schema(df)
        self.cols = arrays_from_frame(df)
        self.n = len(df)
        self.image_size = image_size
        self.previous_images = previous_images
        self.num_frames = 4 if previous_images else 1
        self._rng = np.random.default_rng(seed)
        # optional RAM cache of decoded frames: epochs >= 2 serve images
        # from memory instead of re-decoding the same JPEGs every epoch
        # (the reference re-decodes per __getitem__ per epoch through its
        # DataLoader workers, q_learning_real.py:55-98). cache_bytes caps
        # the cache; once full, insertion stops — under uniform random
        # sampling the hit rate equals the cached fraction, and a
        # stop-when-full cache achieves it with zero eviction work where
        # an LRU would thrash. cache_images=True means unbounded.
        if cache_bytes is not None and cache_bytes > 0:
            self._image_cache = {}
            self._cache_budget = int(cache_bytes)
        else:
            self._image_cache = {} if cache_images else None
            self._cache_budget = None
        self._cache_used = 0

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

    def _stack_paths(self, path: str, start: int):
        if self.previous_images:
            return self._history_paths(path, start)
        return [path]

    def _load_stack(self, path: str, start: int) -> np.ndarray:
        return self._images(self._stack_paths(path, start))

    def _images(self, paths) -> np.ndarray:
        """(len(paths), S, S, 3) uint8 — ONE native batched decode call for
        everything not already in the RAM cache. Duplicate paths (random
        sampling of small datasets; previous_images history clamped at
        im_start repeats a frame up to 4x per stack) decode once."""
        if self._image_cache is None:
            uniq = list(dict.fromkeys(paths))
            if len(uniq) == len(paths):
                return load_images(paths, self.image_size)
            decoded = dict(zip(uniq, load_images(uniq, self.image_size)))
            return np.stack([decoded[p] for p in paths])
        cache = self._image_cache
        missing = [p for p in dict.fromkeys(paths) if p not in cache]
        if missing:
            decoded = dict(zip(missing, load_images(missing, self.image_size)))
            for p, img in decoded.items():
                if (self._cache_budget is not None
                        and self._cache_used + img.nbytes > self._cache_budget):
                    continue  # budget full: stop inserting (no eviction)
                cache[p] = img
                self._cache_used += img.nbytes
            return np.stack([
                cache[p] if p in cache else decoded[p] for p in paths
            ])
        return np.stack([cache[p] for p in paths])

    def get_batch(self, indices: Optional[np.ndarray] = None, batch_size: int = 16) -> Dict[str, np.ndarray]:
        if indices is None:
            indices = self._rng.integers(0, self.n, batch_size)
        # flatten every frame of the batch into ONE decode call (the
        # native stage threads across images; per-image Python dispatch
        # would serialize it)
        paths = [
            p
            for col in ("before_image", "after_image")
            for i in indices
            for p in self._stack_paths(self.cols[col][i], self.cols["im_start"][i])
        ]
        imgs = self._images(paths)
        b, f, s = len(indices), self.num_frames, self.image_size
        imgs = imgs.reshape(2, b, f, s, s, 3)
        before, after = imgs[0], imgs[1]
        return {
            "before": before,  # (B, F, S, S, 3) uint8
            "after": after,
            "action": self.action[indices],
            "reward": self.reward[indices],
            "terminal": self.terminal[indices],
            "gt": self.gt[indices],
            "valid_mask": self.valid_mask[indices],
        }

    def index_stream(self, batch_size: int):
        """Infinite shuffled row-index stream (shuffle + drop_last, the
        reference's loopLoader semantics, train_q_network.py:60-67,98).
        Deterministic in the seed, so every process of a multi-host run
        derives the SAME global index sequence and decodes only its
        slice (train/dqn.py multi-host stream)."""
        if batch_size > self.n:
            raise ValueError(
                f"batch_size {batch_size} exceeds dataset size {self.n}; "
                f"drop_last semantics would yield no batches"
            )
        while True:
            perm = self._rng.permutation(self.n)
            for i in range(0, self.n - batch_size + 1, batch_size):  # drop_last
                yield perm[i : i + batch_size]

    def batches(self, batch_size: int):
        """Infinite shuffled batch stream (the reference's loopLoader +
        shuffle DataLoader, train_q_network.py:60-67,98)."""
        for rows in self.index_stream(batch_size):
            yield self.get_batch(rows)
