"""Image-pair stream: batched loading of (before, after) image path pairs.

Capability parity with the reference ImageStream
(/root/reference/dataloaders/image_streams.py:14-27): iterate an (N, 2)
array of path pairs as transformed image tuples — used by the inverse
labeling stage. TPU-first difference: batches come back as uint8 NHWC
stacks for one device-side normalize+forward instead of per-row PIL
tensors through 4 worker processes.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from .qlearning import load_images


class ImageStream:
    def __init__(self, path_pairs, image_size: int = 224):
        self.pairs = np.asarray(path_pairs)
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, ...]:
        # same decode backend as batches() so item and batch contents match
        return tuple(load_images(self.pairs[i], self.image_size))

    def batches(self, batch_size: int = 8) -> Iterator[Tuple[np.ndarray, ...]]:
        """Yield tuples of (B, S, S, 3) uint8 stacks, one per column."""
        n_cols = self.pairs.shape[1]
        for i in range(0, len(self.pairs), batch_size):
            chunk = self.pairs[i : i + batch_size]
            yield tuple(
                load_images(chunk[:, c], self.image_size)
                for c in range(n_cols)
            )
