"""Results reader: merge sharded episode results, print per-episode SPL
and the mean (parity with /root/reference/evaluation/results.py:5-13)."""

from __future__ import annotations

import os

from video_dqn_tpu.core import DiskReader
from video_dqn_tpu.eval.policy_config import name_from_config


def display_results(config, quiet: bool = False):
    log_folder = os.path.join(config.RESULT_LOCATION, name_from_config(config))
    data = DiskReader(log_folder).data()
    if not data:
        if not quiet:
            print(f"no results in {log_folder}")
        return None
    if not quiet:
        for k in sorted(data.keys()):
            print(f"Episode {k}: SPL {data[k]}")
    mean = sum(data.values()) / len(data)
    if not quiet:
        print(f"Mean SPL: {mean}")
    return mean
