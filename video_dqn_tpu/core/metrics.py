"""Metrics writer: tensorboardX scalars/images when available, always
mirrored to a newline-delimited `metrics.jsonl` so tooling without TF
protobuf support can read training curves.

Replaces the reference's bare SummaryWriter usage
(/root/reference/experiment_config.py:30-32, train_q_network.py:236-238).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsWriter:
    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "ts": time.time()})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_image(self, tag: str, image, step: int) -> None:
        """image: HWC uint8 ndarray. Saved as PNG next to the jsonl; also
        forwarded to tensorboard when available."""
        import numpy as np

        img = np.asarray(image)
        try:
            from PIL import Image

            path = os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step}.png")
            Image.fromarray(img).save(path)
        except Exception:
            pass
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def read_metrics(log_dir: str, tag: Optional[str] = None):
    """Read back scalars from metrics.jsonl (list of dicts)."""
    out = []
    path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if tag is None or rec["tag"] == tag:
                out.append(rec)
    return out
