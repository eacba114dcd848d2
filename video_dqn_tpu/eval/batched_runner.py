"""Cross-episode vectorized evaluation (the BASELINE.json stretch goal:
"vectorized multi-episode rollout").

K episodes run concurrently as coroutines (eval/evaluate.episode_generator);
whenever several episodes are waiting at a semantic-reasoning stop, their
pending view batches are scored in ONE fused device call over the
concatenated (sum_V, F, H, W, 3) stack. Per-episode env stepping, mapping,
and planning remain sequential host/C++ work inside each coroutine — the
device only ever sees large batches.

The per-episode behavior is bit-identical to the sequential runner (the
same generator produces the same requests; only the batching of device
calls changes), so SPL results match run_policy exactly.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from video_dqn_tpu.core import DiskLogger
from video_dqn_tpu.eval.evaluate import episode_generator
from video_dqn_tpu.eval.policy_config import name_from_config


def run_policy_batched(
    config,
    episodes,
    env_factory: Callable,
    house_factory: Callable,
    scorer: Callable,
    class_index_of=None,
    detector=None,
    max_concurrent: int = 8,
    pipeline_depth: int = 1,
    host_workers: int = 0,
    resume: bool = False,
    gather_timeout: float = 0.0,
    progress_every: float = 0.0,
    debug: bool = False,
):
    """Run all episodes with up to `max_concurrent` in flight.

    env_factory(house, config) -> a FRESH env per episode (concurrent
    episodes cannot share an env); scorer scores a (V, ...) uint8 batch
    for a given class via scorer(images, class_index) OR a plain
    per-batch scorer when class_index_of is None.

    `pipeline_depth` > 1 splits the in-flight episodes into that many
    cohorts and software-pipelines them: while one cohort's fused view
    batch is being scored on the device (JAX dispatch is asynchronous),
    the other cohorts' episodes do their host/C++ work (env stepping,
    SLAM mapping, FMM planning). This hides the device call — the
    reference never overlaps them (its eval is one blocking forward per
    view, evaluate.py:110-114). Scorers built by `make_multiclass_scorer`
    expose non-blocking `.dispatch`/`.gather`; plain callables degrade to
    synchronous scoring (pipelining then only reorders, never overlaps).
    Per-episode results are bit-identical for any depth/cohort split:
    scoring is per-row, so batch composition cannot change values.

    `host_workers` > 0 advances the episodes of a cohort in a thread
    pool: the per-episode host work (numpy SLAM mapping, native FMM and
    raycasts — all GIL-releasing) runs across cores on multi-core
    production hosts. Safe because every episode owns its env, mapper,
    and fmm/opened-grid caches (plan/mapper.py keeps them per
    instance); results and DiskLogger writes stay on the calling
    thread. On a 1-core host this changes nothing but ordering of
    Python-level interleaving — results remain bit-identical.

    `gather_timeout` > 0 is the device-stall watchdog (SURVEY section 5
    "failure detection"): a gather that blocks past the timeout raises
    instead of hanging the workload silently — motivated by a real
    incident where a dropped TPU tunnel froze a 1,075-episode run for
    80+ minutes with zero signal. The first gather is exempt (backends
    may defer compile/warmup to first execution); steady-state fused
    scoring is sub-second, so a generous timeout has no false positives.
    Finished episodes are already in the DiskLogger shards, so the loud
    failure composes with `resume=True` into crash-safe recovery.

    `progress_every` > 0 prints done/total, rate, and ETA at most every
    that many seconds (long workloads otherwise emit nothing until the
    final summary).
    """
    log_folder = os.path.join(config.RESULT_LOCATION, name_from_config(config))
    logger = DiskLogger(log_folder, checkpoint_time=60 * 30)

    from video_dqn_tpu.sim.gibson import CLASS_LABELS, relevant_locations

    results = {}
    if resume:
        # skip episodes whose results already exist in the shards (crash-
        # safe merge, same contract as the sequential runner). Bit-safe for
        # the generated workloads: episode content is fixed at fixture
        # time and the env seed counter only feeds start-state sampling,
        # which eval never calls mid-episode.
        from video_dqn_tpu.core import DiskReader

        results = dict(DiskReader(log_folder).data())
        if results:
            print(f"Resuming: {len(results)} episodes already on disk")
    pending = [(i, ep) for i, ep in enumerate(episodes) if i not in results]

    def launch_into(cohort):
        if not pending:
            return False
        epind, ep = pending.pop(0)
        hn, floor, class_label, goal_dist, pos, rot = ep
        house = house_factory(hn)
        env = env_factory(house, config)
        loc = env.sample_start_state(int(floor))[0]
        env.goals = relevant_locations(
            loc, house.object_locations_for_habitat_dest[class_label]
        )
        env.set_agent_state(pos, rot)
        gen = episode_generator(
            config, env, ep, house, epind, visualize=False,
            detector=detector,
        )
        ci = CLASS_LABELS.index(class_label)
        try:
            req = next(gen)
            cohort[epind] = (gen, ci, req)
        except StopIteration as stop:
            results[epind] = stop.value
            if not debug:
                logger.write(epind, stop.value)
        return True

    import time

    t_start = time.time()
    done_initial = len(results)
    total = len(results) + len(pending)
    last_report = [t_start]

    def maybe_report():
        if not progress_every:
            return
        now = time.time()
        if now - last_report[0] < progress_every:
            return
        done = len(results) - done_initial
        rate = done / max(now - t_start, 1e-9)
        left = total - len(results)
        eta = left / rate / 60 if rate > 0 else float("inf")
        print(f"[batched] {len(results)}/{total} episodes "
              f"({rate:.3f} ep/s, ETA {eta:.1f} min)", flush=True)
        last_report[0] = now

    if hasattr(scorer, "dispatch") and hasattr(scorer, "gather"):
        do_dispatch, do_gather = scorer.dispatch, scorer.gather
    else:
        def do_dispatch(stacked, cls):
            return scorer(stacked, cls) if cls is not None else scorer(stacked)

        def do_gather(handle):
            return handle

    if gather_timeout and gather_timeout > 0:
        # daemon worker (NOT a ThreadPoolExecutor: its non-daemon threads
        # would block interpreter exit while parked inside the very hung
        # gather the watchdog just reported)
        import queue as _queue
        import threading as _threading

        req_q, res_q = _queue.Queue(), _queue.Queue()
        inner_gather = do_gather

        def _gather_worker():
            while True:
                h = req_q.get()
                try:
                    res_q.put((inner_gather(h), None))
                except BaseException as e:  # surface scorer errors too
                    res_q.put((None, e))

        _threading.Thread(target=_gather_worker, daemon=True).start()
        first_gather_done = [False]

        def do_gather(handle):  # noqa: F811 — watchdog wrapper
            req_q.put(handle)
            try:
                out, err = res_q.get(
                    timeout=None if not first_gather_done[0] else gather_timeout)
            except _queue.Empty:
                raise RuntimeError(
                    f"device gather stalled past {gather_timeout:.0f}s in "
                    "steady state (normal fused scoring is sub-second) — "
                    "device/tunnel failure suspected. Finished episodes "
                    "are on disk; rerun with -r/--resume to continue."
                ) from None
            if err is not None:
                raise err
            first_gather_done[0] = True
            return out

    def fuse_and_dispatch(cohort):
        # fuse the cohort's pending requests into ONE score call (a
        # class_index-aware scorer batches across classes too)
        if not cohort:
            return None
        items = list(cohort.items())
        batches = [req for _, (_, _, req) in items]
        sizes = [len(b) for b in batches]
        stacked = np.concatenate(batches, axis=0)
        cls = None
        if class_index_of is not None:
            cls = np.concatenate(
                [np.full(n, ci) for n, (_, (_, ci, _)) in zip(sizes, items)]
            )
        return items, sizes, do_dispatch(stacked, cls)

    pool = None
    if host_workers and host_workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=int(host_workers))

    def _send(gen, part):
        try:
            return gen.send(part), None, False
        except StopIteration as stop:
            return None, stop.value, True

    def advance(cohort, items, sizes, scores):
        # distribute scores + advance each episode to its next request
        # (all the host/C++ per-episode work happens inside gen.send)
        parts, offset = [], 0
        for n in sizes:
            parts.append(np.asarray(scores[offset : offset + n]))
            offset += n
        if pool is not None:
            outs = list(pool.map(
                _send, [gen for _, (gen, _, _) in items], parts))
        else:
            outs = [_send(gen, part)
                    for (_, (gen, _, _)), part in zip(items, parts)]
        for (epind, (gen, ci, _)), (req, value, done) in zip(items, outs):
            if done:
                del cohort[epind]
                results[epind] = value
                if not debug:
                    logger.write(epind, value)
            else:
                cohort[epind] = (gen, ci, req)

    depth = max(1, int(pipeline_depth))
    per_cohort = max(1, -(-max_concurrent // depth))
    cohorts = [dict() for _ in range(depth)]
    inflight = [None] * depth
    for i, c in enumerate(cohorts):
        while len(c) < per_cohort and launch_into(c):
            pass
        inflight[i] = fuse_and_dispatch(c)

    while any(f is not None for f in inflight):
        for i, c in enumerate(cohorts):
            if inflight[i] is not None:
                items, sizes, handle = inflight[i]
                advance(c, items, sizes, do_gather(handle))
            while len(c) < per_cohort and launch_into(c):
                pass
            inflight[i] = fuse_and_dispatch(c)
        maybe_report()
    if pool is not None:
        pool.shutdown()
    return results


def make_multiclass_scorer(model, params, batch_stats, image_size: int = 224,
                           mesh=None, bucket: bool = True):
    """Scorer for the batched runner: (B, F, H, W, 3) uint8 + (B,) class
    indices -> (B,) max-over-actions Q of each view's own class, one
    forward for everything.

    With `mesh`, the view batch is sharded over the mesh's 'data' axis and
    params are replicated, so concurrent episodes' scoring runs
    data-parallel across chips (SURVEY section 2 "multi-device inference"
    stretch goal — the reference scores one view at a time on one GPU,
    evaluate.py:110-114). Ragged batches are padded to the device count.

    `bucket` pads each ragged batch up to the next size in a geometric
    family (12·2^k — 12 is a reasoning stop's view count) so XLA compiles
    O(log K) programs instead of one per distinct in-flight batch size
    (every cold compile through the axon tunnel costs minutes; static
    shapes are the TPU idiom). Scores of pad rows are sliced off, so
    results are bit-identical to unbucketed scoring."""
    import jax
    import jax.numpy as jnp

    from video_dqn_tpu.ops.image import normalize_imagenet
    from video_dqn_tpu.ops.pallas_image import fused_preprocess

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        batch_stats = jax.device_put(batch_stats, replicated)
        n_shard = int(np.prod([mesh.shape[a] for a in ("data",)]))
    else:
        n_shard = 1

    @jax.jit
    def run(images, cls):
        b, f = images.shape[0], images.shape[1]
        if images.shape[2] == image_size and images.shape[3] == image_size:
            x = normalize_imagenet(images.astype(jnp.float32) / 255.0)
        else:
            flat = images.reshape((b * f,) + images.shape[2:])
            x = fused_preprocess(flat, image_size)
            x = x.reshape((b, f, image_size, image_size, 3))
        q = model.apply({"params": params, "batch_stats": batch_stats}, x, False)
        q_cls = jnp.take_along_axis(q, cls[:, None, None], axis=1)[:, 0]
        return q_cls.max(axis=-1)

    def dispatch(images, cls):
        """Non-blocking: pad, ship to device, enqueue the fused forward.

        JAX dispatch is asynchronous — the returned handle is a device
        array still being computed; `gather` blocks on it. The pipelined
        run_policy_batched overlaps other cohorts' host planning with
        this device work."""
        x = np.asarray(images)
        if x.ndim == 4:
            x = x[:, None]
        c = np.asarray(cls, np.int32)
        b = x.shape[0]
        target = b
        if bucket:
            target = 12
            while target < b:
                target *= 2
        target += (-target) % n_shard
        pad = target - b
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
            c = np.concatenate([c, np.repeat(c[-1:], pad, axis=0)])
        if mesh is not None:
            x = jax.device_put(x, batch_sharding)
            c = jax.device_put(c, batch_sharding)
        return run(x, c), b

    def gather(handle):
        out, b = handle
        return np.asarray(out)[:b]

    def scorer(images, cls):
        return gather(dispatch(images, cls))

    scorer.dispatch = dispatch
    scorer.gather = gather
    return scorer
