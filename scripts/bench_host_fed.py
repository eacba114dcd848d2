#!/usr/bin/env python
"""Host-fed training benchmark: sustained frames/sec of the REAL training
path — JPEG decode (worker processes) -> prefetch -> host->HBM transfer ->
jitted double-DQN step — vs the synthetic device-resident headline in
bench.py. VERDICT round 1, next-step 6.

Usage: python scripts/bench_host_fed.py [--workers N] [--steps N]
       [--batch N] [--rows N] [--image-size N]

Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=None,
                    help="decode worker processes (default: probe 0,1,2)")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--rows", type=int, default=600)
    ap.add_argument("--image-size", type=int, default=224)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.core.prefetch import prefetch_to_device
    from video_dqn_tpu.data.qlearning import QLearningBatcher
    from video_dqn_tpu.data.synthetic import make_synthetic_dataset
    from video_dqn_tpu.data.workers import parallel_batches
    from video_dqn_tpu.models.qnet import init_qnet, build_qnet
    from video_dqn_tpu.parallel import batch_sharding, make_mesh, shard_batch
    from video_dqn_tpu.train.dqn import TrainState, jit_train_step
    import optax

    # a real JPEG-backed dataset (decode cost is the point)
    root = "/tmp/bench_host_fed_ds"
    feather = os.path.join(root, "data.feather")
    if not os.path.exists(feather):
        feather = make_synthetic_dataset(
            root, num_videos=6, frames_per_video=args.rows // 6 + 4,
            image_size=args.image_size,
        )
    kwargs = dict(location=feather, one_action=True, inverse_actions=True,
                  image_size=args.image_size, seed=0)

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "extra_capacity"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.LOSS_CLIP = "rect"
    cfg.GAMMA = 0.99
    cfg.LEARNING_RATE = 1e-4

    mesh = make_mesh(len(jax.devices()), 1)
    model = build_qnet(cfg)
    params, batch_stats = init_qnet(model, jax.random.key(0),
                                    image_size=args.image_size)
    tx = optax.adam(cfg.LEARNING_RATE)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        target_params=jax.tree_util.tree_map(jnp.copy, params),
        target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=tx.init(params), ema_loss=jnp.zeros((), jnp.float32),
    )
    step_fn, state, _ = jit_train_step(model, cfg, tx, mesh, state)

    # (workers, transport, ram_cache) — transport: shm = shared-memory
    # ring (one parent-side copy), pipe = pickle through mp.Queue (~3
    # copies of the ~77 MB payload); ram_cache = decoded-frame cache so
    # epochs >= 2 skip JPEG decode entirely (timed warm)
    if args.workers is not None:
        configs = [(args.workers, "shm", False)]
    else:
        configs = [
            (0, None, False),
            (0, None, True),
            (1, "shm", False),
            (2, "shm", False),
            (1, "pipe", False),
            (1, "shm", True),
            (2, "shm", True),
        ]
    import math

    for n_workers, transport, ram_cache in configs:
        kw = dict(kwargs)
        if ram_cache:
            kw["cache_bytes"] = 2 << 30
        if n_workers == 0:
            batcher = QLearningBatcher(**kw)
            stream = batcher.batches(args.batch)
        else:
            stream = parallel_batches(kw, args.batch,
                                      num_workers=n_workers, seed=0,
                                      transport=transport)
        batches = prefetch_to_device(stream, sharding=batch_sharding(mesh),
                                     depth=2)
        it = iter(batches)
        # warmup: compile + fill the pipeline; cache rows additionally
        # cover the dataset so the timed window measures the WARM cache
        warmup = 2 + (2 * math.ceil(args.rows / args.batch) + 2
                      if ram_cache else 0)
        for _ in range(warmup):
            state, m = step_fn(state, next(it))
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step_fn(state, next(it))
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        it.close()
        fps = args.steps * args.batch / dt
        print(json.dumps({
            "metric": "host_fed_train_frames_per_sec",
            "value": round(fps, 1),
            "unit": "frames/sec",
            "decode_workers": n_workers,
            "transport": transport,
            "ram_cache": ram_cache,
            "batch": args.batch,
            "image_size": args.image_size,
            "host_cores": os.cpu_count(),
        }), flush=True)


if __name__ == "__main__":
    main()
