"""Host->HBM double-buffered prefetch.

Replaces the reference's 8 forked DataLoader workers
(/root/reference/train_q_network.py:98) with a producer thread that decodes
batches ahead of the train loop and `jax.device_put`s them with the batch
sharding while the previous step is still executing — so the transfer
overlaps compute (JAX dispatch is async; device_put returns immediately).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


def prefetch_to_device(
    batch_iter: Iterator,
    sharding=None,
    depth: int = 2,
    transform: Optional[Callable] = None,
):
    """Yield device-resident batches, keeping `depth` in flight.

    batch_iter: host batch iterator (dict pytrees of numpy arrays)
    sharding:   jax.sharding.Sharding for every leaf (None = default device)
    transform:  optional host-side fn applied before transfer
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()

    def put(batch):
        if transform is not None:
            batch = transform(batch)
        if sharding is not None:
            return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def blocking_put(item) -> bool:
        """put() that re-checks stop while the queue is full, so a consumer
        that stops iterating early (num_steps break, exception) can't leave
        the producer blocked forever holding device-resident batches."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in batch_iter:
                if stop.is_set():
                    return
                if not blocking_put(put(batch)):
                    return
            blocking_put(sentinel)
        except Exception as e:  # surface in consumer
            blocking_put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
        # release any device-resident batches still queued
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
