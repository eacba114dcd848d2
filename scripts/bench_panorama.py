#!/usr/bin/env python
"""Panorama-config benchmark (round-2 verdict weak item 3: the 4-frame
variant had parity tests but no measured numbers).

Measures, on the current default device:
  * PANORAMA=True double-DQN train step (4 frames/sample folded into the
    batch axis — archs/HabitatDQNMultiAction.py:16-19,49-52 runs the
    backbone per frame then concats; here all B*4 frames are one backbone
    batch) — frames-in/sec, samples/sec, and MFU across a batch probe.
  * Panorama eval scoring: 12 views x 4 frames x 5 classes in ONE device
    call (the reference runs 12 sequential forwards of a 4-frame stack,
    evaluation/evaluate.py:110-114).

Prints one JSON line per row; results recorded in BASELINE.md. bench.py
keeps the single-line headline contract for the driver.

Usage: python scripts/bench_panorama.py [--batches 64,128,256]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scan-chunk", type=int, default=0,
                    help="if >0, dispatch this many steps per XLA program "
                         "(lax.scan, the production TPU.SCAN_CHUNK shape) "
                         "instead of one dispatch per step")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import _peak_flops
    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.data.synthetic import synthetic_batch
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.parallel import make_mesh, shard_batch
    from video_dqn_tpu.train.dqn import TrainState, jit_train_step

    peak = _peak_flops(jax.devices()[0]) or 0.0
    n_chips = len(jax.devices())

    cfg = get_cfg_defaults()
    cfg.PANORAMA = True
    cfg.ARCHITECTURE = "extra_capacity"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.LOSS_CLIP = "rect"
    cfg.GAMMA = 0.99
    cfg.LEARNING_RATE = 1e-4

    mesh = make_mesh(n_chips, 1)
    model = build_qnet(cfg)
    tx = optax.adam(cfg.LEARNING_RATE)

    for batch_size in [int(b) for b in args.batches.split(",")]:
        params, batch_stats = init_qnet(model, jax.random.key(0),
                                        image_size=224)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
            opt_state=tx.init(params), ema_loss=jnp.zeros((), jnp.float32),
        )
        step_fn, state, _ = jit_train_step(model, cfg, tx, mesh, state)
        host = synthetic_batch(batch_size=batch_size, num_frames=4,
                               image_size=224)
        batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in host.items()})

        flops = None
        try:
            cost = step_fn.lower(state, batch).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception:
            pass

        chunk = max(args.scan_chunk, 0)
        if chunk > 1:
            from video_dqn_tpu.train.dqn import make_train_step

            body_fn = make_train_step(model, cfg, tx)

            def scan_steps(state, batch):
                def body(st, _):
                    return body_fn(st, batch)

                st, ms = jax.lax.scan(body, state, None, length=chunk)
                return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

            step_fn = jax.jit(scan_steps, donate_argnums=(0,))
        else:
            chunk = 1

        for _ in range(3):
            state, m = step_fn(state, batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step_fn(state, batch)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / (args.iters * chunk)

        mfu = (round(flops / dt / (n_chips * peak), 4)
               if flops and peak else None)
        print(json.dumps({
            "metric": "panorama_train_samples_per_sec_per_chip",
            "value": round(batch_size / dt / n_chips, 1),
            "unit": "samples/sec/chip (1 sample = 4 frames)",
            "frames_per_sec_per_chip": round(4 * batch_size / dt / n_chips, 1),
            "batch": batch_size,
            "ms_per_step": round(dt * 1000, 2),
            "mfu": mfu,
            "tflops_per_step": round(flops / 1e12, 3) if flops else None,
            "scan_chunk": chunk,
        }))

    # eval side: 12 views x 4 frames x 5 classes, one device call
    from video_dqn_tpu.eval.evaluate import make_model_scorer

    params, batch_stats = init_qnet(model, jax.random.key(0), image_size=224)
    scorer = make_model_scorer(model, params, batch_stats, class_index=4)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (12, 4, 224, 224, 3), np.uint8)
    scorer(images)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        scorer(images)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": "panorama_eval_views_per_sec",
        "value": round(12 / dt, 1),
        "unit": "4-frame views/sec",
        "ms_per_12view_stop": round(dt * 1000, 1),
    }))


if __name__ == "__main__":
    main()
