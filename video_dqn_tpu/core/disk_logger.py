"""Crash-safe sharded result logger.

Same contract as the reference DiskLogger/DiskReader
(/root/reference/disk_logger.py:9-43): each logger instance appends results
into an in-memory dict and rewrites its own uniquely-named shard file on
every `write`; shards rotate after `checkpoint_time` seconds so a crash
loses at most one rotation window; the reader shallow-merges all shards in
mtime order (last writer wins), which makes evaluation runs resumable and
mergeable across processes.

Implementation difference: shards are `.npz`-free plain pickles of a dict
via numpy save (same as reference's np.save of an object dict), with
atomic tmp+rename writes the reference lacked.
"""

from __future__ import annotations

import os
import secrets
import time
from typing import Any, Dict

import numpy as np


class DiskLogger:
    def __init__(self, folder: str, checkpoint_time: float = 60 * 30):
        self.folder = folder
        self.checkpoint_time = checkpoint_time
        os.makedirs(folder, exist_ok=True)
        self._data: Dict[Any, Any] = {}
        self._new_shard()

    def _new_shard(self) -> None:
        self._shard_start = time.time()
        self._shard_id = f"{secrets.token_hex(8)}_{int(self._shard_start)}"
        self._data = {}

    @property
    def shard_path(self) -> str:
        return os.path.join(self.folder, f"{self._shard_id}.npy")

    def write(self, key: Any, value: Any) -> None:
        if time.time() - self._shard_start > self.checkpoint_time:
            self._new_shard()
        self._data[key] = value
        tmp = self.shard_path + ".tmp.npy"
        np.save(tmp, np.array([self._data], dtype=object), allow_pickle=True)
        os.replace(tmp, self.shard_path)


class DiskReader:
    def __init__(self, folder: str):
        self.folder = folder

    def data(self) -> Dict[Any, Any]:
        if not os.path.isdir(self.folder):
            return {}
        shards = [
            os.path.join(self.folder, f)
            for f in os.listdir(self.folder)
            if f.endswith(".npy") and not f.endswith(".tmp.npy")
        ]
        shards.sort(key=os.path.getmtime)
        merged: Dict[Any, Any] = {}
        for path in shards:
            try:
                d = np.load(path, allow_pickle=True)[0]
            except Exception:
                continue  # torn shard from a crash — skip, like the reference's merge
            merged.update(d)
        return merged
