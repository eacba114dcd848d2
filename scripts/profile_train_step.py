#!/usr/bin/env python
"""Train-step MFU attribution (round-2 verdict item 8: account for the
missing 49%).

Measures the headline double-DQN step and its isolated components as
separate XLA programs on the current device — forward-only, forward+
backward, the three-forward ensemble, input normalize, Adam — each with
XLA cost-analysis FLOPs, wall time, and per-component MFU. The gap
between the full step's MFU and the forward/backward programs' MFU is
the price of everything that is not backbone matmuls (elementwise,
layout, optimizer, target-sync selects, uint8 ingest).

Usage: python scripts/profile_train_step.py [batch] [image_size]
"""

import json
import sys
import time

sys.path.insert(0, ".")


def bench(fn, *args, iters=10):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def flops_of(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from bench import _peak_flops
    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.data.synthetic import synthetic_batch
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.ops.image import normalize_imagenet
    from video_dqn_tpu.parallel import make_mesh, shard_batch
    from video_dqn_tpu.train.dqn import (
        TrainState,
        jit_train_step,
        make_loss_fn,
    )

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    image_size = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    peak = _peak_flops(jax.devices()[0]) or 1.0

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
                                    image_size=image_size)
    tx = optax.adam(cfg.LEARNING_RATE)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        target_params=jax.tree_util.tree_map(jnp.copy, params),
        target_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=tx.init(params), ema_loss=jnp.zeros((), jnp.float32),
    )
    step_fn, state, _ = jit_train_step(model, cfg, tx, mesh, state)
    host = synthetic_batch(batch_size=batch_size, num_frames=1,
                           image_size=image_size)
    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in host.items()})

    rows = []

    def report(name, dt, flops):
        rows.append({
            "program": name,
            "ms": round(dt * 1000, 2),
            "tflops": round(flops / 1e12, 3),
            "mfu": round(flops / dt / peak, 4) if flops else None,
        })

    # full step — donated state must be re-threaded through each call
    full_flops = flops_of(step_fn, state, batch)
    import jax as _jax

    for _ in range(3):
        state, m = step_fn(state, batch)
    _jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, m = step_fn(state, batch)
    _jax.block_until_ready(m["loss"])
    report("full_step", (time.perf_counter() - t0) / iters, full_flops)

    x = normalize_imagenet(batch["before"].astype(jnp.float32)[:, 0] / 255.0)

    # single inference forward
    @jax.jit
    def fwd(p, bs, xx):
        return model.apply({"params": p, "batch_stats": bs}, xx[:, None], False)

    dt = bench(fwd, state.params, state.batch_stats, x)
    report("forward_1x", dt, flops_of(fwd, state.params, state.batch_stats, x))

    # forward + backward (the gradient-carrying half)
    @jax.jit
    def fwd_bwd(p, bs, xx):
        def f(pp):
            return model.apply(
                {"params": pp, "batch_stats": bs}, xx[:, None], False
            ).sum()

        return jax.grad(f)(p)

    dt = bench(fwd_bwd, state.params, state.batch_stats, x)
    report("forward_backward", dt,
           flops_of(fwd_bwd, state.params, state.batch_stats, x))

    # the full loss ensemble (3 forwards, one differentiated) w/o optimizer
    loss_fn = make_loss_fn(model, cfg)

    @jax.jit
    def loss_grads(p, tp, bs, tbs, b):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, tp, bs, tbs, b)
        return l, g

    args = (state.params, state.target_params, state.batch_stats,
            state.target_batch_stats, batch)
    dt = bench(lambda *a: loss_grads(*a)[0], *args)
    report("loss_plus_grads", dt, flops_of(loss_grads, *args))

    # uint8 ingest + normalize alone
    @jax.jit
    def prep(b):
        return (normalize_imagenet(b["before"].astype(jnp.float32) / 255.0)
                + normalize_imagenet(b["after"].astype(jnp.float32) / 255.0)).sum()

    dt = bench(prep, batch)
    report("uint8_normalize", dt, flops_of(prep, batch))

    # Adam update alone
    @jax.jit
    def adam(g, o, p):
        u, no = tx.update(g, o, p)
        return optax.apply_updates(p, u), no

    grads = jax.jit(lambda *a: loss_grads(*a)[1])(*args)
    jax.block_until_ready(grads)
    dt = bench(adam, grads, state.opt_state, state.params)
    report("adam_update", dt, flops_of(adam, grads, state.opt_state,
                                       state.params))

    for r in rows:
        print(json.dumps(r))
    full = rows[0]
    lg = next(r for r in rows if r["program"] == "loss_plus_grads")
    print(json.dumps({
        "program": "overhead_step_minus_lossgrads",
        "ms": round(full["ms"] - lg["ms"], 2),
        "note": "optimizer + target-sync selects + EMA + donation copies",
    }))


if __name__ == "__main__":
    main()
