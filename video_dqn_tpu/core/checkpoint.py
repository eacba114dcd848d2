"""Checkpointing: `{step, params, target_params, opt_state}` snapshots with
the reference's `sample<N>` naming contract
(/root/reference/train_q_network.py:241-247) and `ls`-free max-N resume
(reference parsed `ls` output, train_q_network.py:286-294).

Format: flax msgpack serialization of the host pytree, written atomically
(tmp + rename) so a crash mid-write never corrupts the latest snapshot.
Device arrays are pulled to host first; restore rebuilds against a target
pytree so shapes/dtypes are validated structurally.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
from flax import serialization


def checkpoint_path(models_dir: str, step: int) -> str:
    return os.path.join(models_dir, f"sample{step}.ckpt")


def save_checkpoint(models_dir: str, step: int, tree: Dict[str, Any]) -> str:
    os.makedirs(models_dir, exist_ok=True)
    host_tree = serialization.to_state_dict(jax.device_get(tree))
    payload = serialization.msgpack_serialize(
        {"sample_number": step, "state": host_tree}, in_place=True
    )
    path = checkpoint_path(models_dir, step)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


def latest_checkpoint_step(models_dir: str) -> Optional[int]:
    if not os.path.isdir(models_dir):
        return None
    steps = []
    for f in os.listdir(models_dir):
        m = re.match(r"^sample(\d+)\.ckpt$", f)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(models_dir: str, step: int, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of `target` (a template pytree)."""
    path = checkpoint_path(models_dir, step)
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    restored = serialization.from_state_dict(
        {"sample_number": step, "state": target}, raw
    )
    assert int(raw["sample_number"]) == step, "checkpoint step mismatch"
    return restored["state"]
