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
    debug: bool = False,
):
    """Run all episodes with up to `max_concurrent` in flight.

    env_factory(house, config) -> a FRESH env per episode (concurrent
    episodes cannot share an env); scorer scores a (V, ...) uint8 batch
    for a given class via scorer(images, class_index) OR a plain
    per-batch scorer when class_index_of is None.
    """
    log_folder = os.path.join(config.RESULT_LOCATION, name_from_config(config))
    logger = DiskLogger(log_folder, checkpoint_time=60 * 30)

    from video_dqn_tpu.sim.gibson import CLASS_LABELS, relevant_locations

    pending = list(enumerate(episodes))
    active = {}  # epind -> (gen, class_index, awaiting_request)
    results = {}

    def launch_one():
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
            active[epind] = (gen, ci, req)
        except StopIteration as stop:
            results[epind] = stop.value
            if not debug:
                logger.write(epind, stop.value)
        return True

    while len(active) < max_concurrent and launch_one():
        pass

    while active:
        # fuse all pending requests into per-class score calls (a single
        # class_index-aware scorer can batch across classes too)
        items = list(active.items())
        batches = [req for _, (_, _, req) in items]
        sizes = [len(b) for b in batches]
        stacked = np.concatenate(batches, axis=0)
        if class_index_of is not None:
            cls = np.concatenate(
                [np.full(n, ci) for n, (_, (_, ci, _)) in zip(sizes, items)]
            )
            scores = scorer(stacked, cls)
        else:
            scores = scorer(stacked)
        # distribute + advance each episode to its next request
        offset = 0
        for (epind, (gen, ci, _)), n in zip(items, sizes):
            part = np.asarray(scores[offset : offset + n])
            offset += n
            try:
                req = gen.send(part)
                active[epind] = (gen, ci, req)
            except StopIteration as stop:
                del active[epind]
                results[epind] = stop.value
                if not debug:
                    logger.write(epind, stop.value)
                while len(active) < max_concurrent and launch_one():
                    pass
    return results


def make_multiclass_scorer(model, params, batch_stats, image_size: int = 224,
                           mesh=None):
    """Scorer for the batched runner: (B, F, H, W, 3) uint8 + (B,) class
    indices -> (B,) max-over-actions Q of each view's own class, one
    forward for everything.

    With `mesh`, the view batch is sharded over the mesh's 'data' axis and
    params are replicated, so concurrent episodes' scoring runs
    data-parallel across chips (SURVEY section 2 "multi-device inference"
    stretch goal — the reference scores one view at a time on one GPU,
    evaluate.py:110-114). Ragged batches are padded to the device count."""
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

    def scorer(images, cls):
        x = np.asarray(images)
        if x.ndim == 4:
            x = x[:, None]
        c = np.asarray(cls, np.int32)
        b = x.shape[0]
        pad = (-b) % n_shard
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
            c = np.concatenate([c, np.repeat(c[-1:], pad, axis=0)])
        if mesh is not None:
            x = jax.device_put(x, batch_sharding)
            c = jax.device_put(c, batch_sharding)
        out = np.asarray(run(x, c))
        return out[:b]

    return scorer
