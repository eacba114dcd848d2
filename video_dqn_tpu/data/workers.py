"""Multi-process JPEG-decode workers feeding the training infeed.

The reference hides decode latency behind 8 forked torch DataLoader
workers (/root/reference/train_q_network.py:98); this is the equivalent
stage for the TPU trainer: N processes each own a QLearningBatcher (the
feather columns re-load per process; images decode through the native
batched jpeg stage when built, PIL otherwise), pull index blocks from a
shared queue, and push finished uint8 batches to the parent, which hands
them to core/prefetch.prefetch_to_device for the host->HBM double buffer.

Transport (round-4, addressing the round-3 finding that worker IPC lost
to in-process decode): image payloads move through a ring of
fork-inherited shared-memory slots — the worker decodes, writes the
(2, B, F, S, S, 3) uint8 block into its assigned slot, and the parent
copies it out ONCE. The default pickle/pipe path costs ~3 full copies of
the ~77 MB batch-256 payload plus syscall churn per batch (serialize in
the worker, kernel pipe write+read, deserialize in the parent);
`transport="pipe"` keeps it for A/B. Label arrays (a few KB) still ride
the result queue either way.

Decode throughput scales ~linearly with worker count up to the host's
core count (this container has 1 core — production TPU-VM hosts have
~100+). NOTE: with the native stage present, a single in-process batcher
already threads the decode across all cores inside one C call
(native/decode/jpeg.cc), so worker PROCESSES are only worth their IPC
cost when decode must overlap non-decode host work (device dispatch,
h2d staging) or the per-epoch RAM cache (QLearningBatcher cache_bytes)
lives in each worker.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
from typing import Dict, Iterator, Optional

import numpy as np

_WORKER_BATCHER = None

_LABEL_KEYS = ("action", "reward", "terminal", "gt", "valid_mask")


def _worker_init(batcher_kwargs: Dict):
    global _WORKER_BATCHER
    from video_dqn_tpu.data.qlearning import QLearningBatcher

    _WORKER_BATCHER = QLearningBatcher(**batcher_kwargs)


def _worker_loop(batcher_kwargs, index_q, out_q, stop, jpeg_threads, slots,
                 slot_shape):
    # each worker PROCESS limits its native jpeg THREAD pool so W workers
    # don't each spawn all-cores pools (W-fold oversubscription of the
    # decode stage on multi-core hosts)
    import os

    os.environ["VDQN_JPEG_THREADS"] = str(jpeg_threads)
    _worker_init(batcher_kwargs)
    views = None
    if slots is not None:
        views = [
            np.frombuffer(s, np.uint8).reshape(slot_shape) for s in slots
        ]
    while not stop.is_set():
        try:
            item = index_q.get(timeout=0.2)
        except queue_mod.Empty:
            continue
        if item is None:
            return
        seq, indices, slot_id = item
        try:
            batch = _WORKER_BATCHER.get_batch(indices=np.asarray(indices))
            if views is None:
                out_q.put((seq, slot_id, batch))
            else:
                view = views[slot_id]
                view[0] = batch["before"]
                view[1] = batch["after"]
                out_q.put(
                    (seq, slot_id, {k: batch[k] for k in _LABEL_KEYS})
                )
        except Exception as e:  # surface in parent
            out_q.put((seq, None, e))
            return


def parallel_batches(
    batcher_kwargs: Dict,
    batch_size: int,
    num_workers: int = 2,
    seed: int = 0,
    queue_depth: int = 4,
    n_samples: Optional[int] = None,
    transport: str = "shm",
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (or n_samples-bounded) shuffled batch stream decoded by
    `num_workers` processes. Batches are re-ordered to the submission
    sequence so the stream is deterministic for a given seed regardless of
    worker scheduling or transport.

    Worker processes start EAGERLY (in this call, on the calling thread),
    not at the first next(): forking lazily would happen inside the
    prefetcher's producer thread after the TPU runtime initialized — the
    classic fork-after-accelerator-init hazard (torch DataLoader forks
    before CUDA init for the same reason). Call this before any device
    work (run_train does)."""
    import ctypes
    import os

    from video_dqn_tpu.data import native_decode
    from video_dqn_tpu.data.qlearning import QLearningBatcher

    if transport not in ("shm", "pipe"):
        raise ValueError(f"unknown transport {transport!r}")

    # build/load the native decode library ONCE in the parent before
    # forking: concurrent first-use builds in N children raced `make`
    # (the flock in native_decode._load is the second line of defense)
    native_decode.available()

    # index stream comes from the parent (one RNG, deterministic)
    probe = QLearningBatcher(**batcher_kwargs)
    n = len(probe)
    num_frames = probe.num_frames
    image_size = probe.image_size
    del probe

    ctx = mp.get_context("fork")
    n_slots = queue_depth * max(1, num_workers)
    slot_shape = (2, batch_size, num_frames, image_size, image_size, 3)
    slots = None
    if transport == "shm":
        # anonymous fork-inherited buffers: no names, no resource tracker,
        # freed with the processes
        nbytes = int(np.prod(slot_shape))
        slots = [ctx.RawArray(ctypes.c_ubyte, nbytes) for _ in range(n_slots)]

    jpeg_threads = max(1, (os.cpu_count() or 1) // max(1, num_workers))
    index_q = ctx.Queue(maxsize=n_slots)
    out_q = ctx.Queue(maxsize=n_slots)
    stop = ctx.Event()
    procs = [
        ctx.Process(target=_worker_loop,
                    args=(batcher_kwargs, index_q, out_q, stop, jpeg_threads,
                          slots, slot_shape),
                    daemon=True)
        for _ in range(num_workers)
    ]
    for p in procs:
        p.start()
    return _drive_workers(n, batch_size, num_workers, seed, queue_depth,
                          n_samples, index_q, out_q, stop, procs, slots,
                          slot_shape)


def _drive_workers(n, batch_size, num_workers, seed, queue_depth, n_samples,
                   index_q, out_q, stop, procs, slots, slot_shape):
    rng = np.random.default_rng(seed)
    views = None
    n_slots = queue_depth * max(1, num_workers)
    free_slots = list(range(n_slots))
    if slots is not None:
        views = [np.frombuffer(s, np.uint8).reshape(slot_shape) for s in slots]
    pending: Dict[int, object] = {}
    submitted = 0
    emitted = 0
    try:
        while n_samples is None or emitted < n_samples:
            # keep the index queue primed (bounded by free slots: a slot is
            # writable again once the parent copied its batch out)
            while (submitted - emitted) < n_slots and free_slots:
                idx = rng.integers(0, n, batch_size)
                slot_id = free_slots[-1]
                try:
                    index_q.put((submitted, idx.tolist(), slot_id),
                                timeout=0.2)
                except queue_mod.Full:
                    break
                free_slots.pop()
                submitted += 1
            # drain results, emit in order
            try:
                seq, slot_id, result = out_q.get(timeout=10.0)
            except queue_mod.Empty:
                if not any(p.is_alive() for p in procs):
                    raise RuntimeError("all decode workers died")
                continue
            if isinstance(result, Exception):
                raise result
            if views is not None:
                view = views[slot_id]
                # ONE copy out of shared memory; the slot is then free
                result = dict(result)
                result["before"] = np.array(view[0])
                result["after"] = np.array(view[1])
            pending[seq] = result
            free_slots.append(slot_id)
            while emitted in pending and (
                n_samples is None or emitted < n_samples
            ):
                yield pending.pop(emitted)
                emitted += 1
    finally:
        stop.set()
        for _ in procs:
            try:
                index_q.put_nowait(None)
            except queue_mod.Full:
                pass
        # drain queues so children aren't blocked on put
        for q in (out_q, index_q):
            try:
                while True:
                    q.get_nowait()
            except queue_mod.Empty:
                pass
        for p in procs:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()
