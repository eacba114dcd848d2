"""Q-learning quadruplet feather schema.

Exact column contract of the reference's `dataset/data.feather`
(/root/reference/dataset/process_episodes_real.py:144-161,179-181 and the
wide-column codec /root/reference/util/pd.py:6-14):

  before_image, after_image, ep_id, im_start, im_stop,
  detector_score0..4, sparse_reward0..4,
  steps_to_reward0..4, steps_to_reward_neg0..4, inverse_actions

so feathers produced by either side load in the other.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
import pandas as pd

# Per-class detector-confidence thresholds for the 5 sorted COCO classes
# ['bed','chair','couch','dining table','toilet'] — the reward contract
# (reference: dataset/process_episodes_real.py:17-20 ==
# dataloaders/q_learning_real.py:15-18).
DETECTION_THRESHOLDS = np.array(
    [
        0.9700177907943726,
        0.9738382697105408,
        0.9512060284614563,
        0.7334915995597839,
        0.7058018445968628,
    ],
    dtype=np.float64,
)

CLASS_LABELS = ["bed", "chair", "couch", "dining table", "toilet"]

WIDE_COLUMNS = ("detector_score", "sparse_reward", "steps_to_reward", "steps_to_reward_neg")


def multi_add(df: pd.DataFrame, arr: np.ndarray, name: str) -> None:
    """Spread an (N, C) array into columns name0..name{C-1}."""
    for c in range(arr.shape[1]):
        df[f"{name}{c}"] = arr[:, c]


def multi_get(df, name: str) -> np.ndarray:
    """Gather name0..name{C-1} back into an (N, C) (or (C,) for a row)."""
    cols = df.keys() if isinstance(df, pd.Series) else df.columns
    n = len([c for c in cols if re.fullmatch(f"{re.escape(name)}\\d+", c)])
    sel = df[[f"{name}{c}" for c in range(n)]]
    return np.array(tuple(sel) if isinstance(df, pd.Series) else sel)


def write_feather(df: pd.DataFrame, path: str) -> None:
    df.reset_index(drop=True).to_feather(path)


def read_feather(path: str) -> pd.DataFrame:
    return pd.read_feather(path)


def validate_schema(df: pd.DataFrame, num_classes: int = 5) -> None:
    required = ["before_image", "after_image", "ep_id", "im_start", "im_stop"]
    for name in WIDE_COLUMNS:
        required += [f"{name}{c}" for c in range(num_classes)]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"feather missing columns: {missing}")


def arrays_from_frame(df: pd.DataFrame) -> Dict[str, np.ndarray]:
    """Columnar views used by the batcher (one host pass, no per-row work)."""
    out = {
        "before_image": df["before_image"].to_numpy(),
        "after_image": df["after_image"].to_numpy(),
        "im_start": df["im_start"].to_numpy(np.int64),
        "im_stop": df["im_stop"].to_numpy(np.int64),
        "detector_score": multi_get(df, "detector_score").astype(np.float32),
        "sparse_reward": multi_get(df, "sparse_reward").astype(np.float32),
        "steps_to_reward": multi_get(df, "steps_to_reward").astype(np.float32),
        "steps_to_reward_neg": multi_get(df, "steps_to_reward_neg").astype(np.float32),
    }
    if "inverse_actions" in df.columns:
        out["inverse_actions"] = df["inverse_actions"].to_numpy(np.int32)
    return out
