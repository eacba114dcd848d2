"""Gibson simulator trajectory-pair batches (inverse-model training data).

Capability parity with the reference GibsonDatasetPair
(/root/reference/dataloaders/gibson.py:24-76): object-dtype npy rows of 22
columns [before_loc(1), before_pos(3), before_ang(4), after_loc(1),
after_pos(3), after_ang(4), action(1), min_dists(5)]; per-class selection
when class_label != 'all'; `known` filtering to samples within reward_dist;
labels (action-1, reward = dist<=reward_dist, terminal, gt = gamma^dist);
panorama mode loads 4 orientation jpgs `<loc>/<o>.jpg` per state.

Differences by design: the reference's hard-coded cluster path for the
non-panorama branch (gibson.py:70-71) is replaced by an explicit
`image_root` argument; label math is columnar at load time.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .qlearning import load_images

VALID_LABELS = sorted(["bed", "chair", "couch", "dining table", "toilet"])


def split_columns(arr: np.ndarray, widths):
    if arr.shape[-1] != sum(widths):
        raise ValueError(f"widths {sum(widths)} != {arr.shape}")
    out, st = [], 0
    for w in widths:
        out.append(arr[..., st : st + w])
        st += w
    return tuple(out)


class GibsonPairBatcher:
    def __init__(
        self,
        file_location: str,
        gamma: float = 0.9,
        panorama: bool = False,
        known: bool = False,
        reward_dist: float = 1.0,
        class_label: str = "toilet",
        image_root: str = "",
        image_size: int = 224,
        seed: int = 0,
        cache_images: bool = False,
    ):
        self.panorama = panorama
        self.image_root = image_root
        self.image_size = image_size
        self.num_frames = 4 if panorama else 1
        self._rng = np.random.default_rng(seed)
        # RAM cache of decoded states: generated pair sets are small
        # (~2k states x 96px = tens of MB) and each state recurs as both
        # `before` and `after` across epochs — decode once
        self._cache = {} if cache_images else None

        samples = np.load(file_location, allow_pickle=True)
        (bel, _bpos, _bang, ael, _apos, _aang, action, min_dists) = split_columns(
            samples, [1, 3, 4, 1, 3, 4, 1, len(VALID_LABELS)]
        )
        dists = min_dists.astype(np.float64)
        if class_label != "all":
            dists = dists[:, [VALID_LABELS.index(class_label)]]
        if known and class_label != "all":
            keep = dists[:, 0] <= reward_dist
            bel, ael, action, dists = bel[keep], ael[keep], action[keep], dists[keep]

        self.before_loc = bel[:, 0]
        self.after_loc = ael[:, 0]
        # reference stores actions 1..3; labels are action-1 (gibson.py:76)
        self.action = action[:, 0].astype(np.int32) - 1
        self.reward = (dists <= reward_dist).astype(np.float32)
        self.terminal = self.reward.copy()
        self.gt = np.power(gamma, dists).astype(np.float32)
        self.n = len(self.before_loc)

    def __len__(self) -> int:
        return self.n

    def _load_state(self, loc: str) -> np.ndarray:
        if self._cache is not None and loc in self._cache:
            return self._cache[loc]
        base = os.path.join(self.image_root, str(loc))
        orientations = range(self.num_frames) if self.panorama else [0]
        out = load_images(
            [os.path.join(base, f"{o}.jpg") for o in orientations],
            self.image_size,
        )
        if self._cache is not None:
            self._cache[loc] = out
        return out

    def get_batch(self, indices: Optional[np.ndarray] = None, batch_size: int = 128) -> Dict[str, np.ndarray]:
        if indices is None:
            indices = self._rng.integers(0, self.n, batch_size)
        return {
            "before": np.stack([self._load_state(self.before_loc[i]) for i in indices]),
            "after": np.stack([self._load_state(self.after_loc[i]) for i in indices]),
            "action": self.action[indices],
            "reward": self.reward[indices],
            "terminal": self.terminal[indices],
            "gt": self.gt[indices],
        }

    def batches(self, batch_size: int, epochs: Optional[int] = None):
        epoch = 0
        while epochs is None or epoch < epochs:
            perm = self._rng.permutation(self.n)
            for i in range(0, self.n - batch_size + 1, batch_size):
                yield self.get_batch(perm[i : i + batch_size])
            epoch += 1
