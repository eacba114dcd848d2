#!/usr/bin/env python
"""Mechanism benchmark for the software-pipelined batched eval runner.

The claim under test (eval/batched_runner.run_policy_batched,
pipeline_depth>1): one cohort's device scoring overlaps the other
cohorts' host planning. Real-chip numbers depend on the axon tunnel's
availability, so this bench isolates the MECHANISM: the real scorer is
wrapped in a simulated asynchronous device with a fixed per-call
latency (dispatch records a deadline; gather sleeps until it passes —
exactly the completion semantics of a JAX async dispatch), and the same
4-episode furnished workload is run at pipeline_depth 1 vs 2. The
per-episode results are asserted identical; the wall-clock difference
is the hidden latency.

Prints one line per depth + a summary. Reference comparison point: the
reference eval never overlaps device and host work at all (one blocking
torch forward per view, /root/reference/evaluation/evaluate.py:110-114).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np  # noqa: E402

LATENCY_S = float(os.environ.get("SIM_DEVICE_LATENCY_S", 0.25))


def make_sim_device_scorer(real, latency_s):
    calls = [0]

    def dispatch(images, cls):
        handle = real.dispatch(images, cls)
        calls[0] += 1
        return handle, time.perf_counter() + latency_s

    def gather(h):
        handle, deadline = h
        out = real.gather(handle)
        now = time.perf_counter()
        if now < deadline:
            time.sleep(deadline - now)
        return out

    scorer = lambda imgs, cls: gather(dispatch(imgs, cls))  # noqa: E731
    scorer.dispatch = dispatch
    scorer.gather = gather
    scorer.calls = calls
    return scorer


def main():
    import jax  # noqa: F401 — force backend init before timing

    from video_dqn_tpu.eval.batched_runner import (
        make_multiclass_scorer,
        run_policy_batched,
    )
    from video_dqn_tpu.eval.fixtures import make_episode_set
    from video_dqn_tpu.eval.policy_config import get_eval_defaults
    from video_dqn_tpu.models.qnet import HabitatDQN, init_qnet

    import jax.numpy as jnp

    size = 64
    model = HabitatDQN(action_dim=3, extra_capacity=False, panorama=False,
                       dtype=jnp.float32)
    params, stats = init_qnet(model, jax.random.key(3), image_size=size)
    episodes, env_factory, house_factory = make_episode_set(
        8, backend="furnished", size=size, fresh_envs=True)
    cfg = get_eval_defaults()
    for k, v in {"SCORE": "model", "SLAM": True, "SEED": 1,
                 "RESULT_LOCATION": "/tmp/bench_pipe_results"}.items():
        cfg[k] = v

    real = make_multiclass_scorer(model, params, stats, image_size=size)
    # warm the jit caches so no config is charged the compiles
    for mc, d in ((4, 1), (8, 2), (8, 1)):
        run_policy_batched(
            cfg, episodes, env_factory=lambda h, c: env_factory(h, None, c),
            house_factory=house_factory, scorer=real, class_index_of=True,
            max_concurrent=mc, pipeline_depth=d, debug=True)

    # (A) vs (B) isolates the overlap at CONSTANT fused-batch shape:
    # both run 4-episode cohorts; (B) keeps a second cohort in flight so
    # its device calls hide behind (A)-identical host planning. (C) is
    # the barrier runner given the same total in-flight budget as (B) —
    # bigger fused batches, but every device call blocks the host.
    # For throughput, raise --batched along with --pipeline-depth
    # (cohort size = batched/depth is what sets the fused batch shape).
    configs = {
        "A: batched=4 depth=1": (4, 1),
        "B: batched=8 depth=2": (8, 2),
        "C: batched=8 depth=1": (8, 1),
    }
    walls, outs = {}, {}
    for label, (mc, depth) in configs.items():
        scorer = make_sim_device_scorer(real, LATENCY_S)
        t0 = time.perf_counter()
        outs[label] = run_policy_batched(
            cfg, episodes, env_factory=lambda h, c: env_factory(h, None, c),
            house_factory=house_factory, scorer=scorer, class_index_of=True,
            max_concurrent=mc, pipeline_depth=depth, debug=True)
        walls[label] = time.perf_counter() - t0
        print(f"{label}: {walls[label]:.2f} s wall, "
              f"{scorer.calls[0]} fused device calls at "
              f"{LATENCY_S * 1000:.0f} ms simulated latency")

    base = outs["A: batched=4 depth=1"]
    for label, out in outs.items():
        for i in base:
            np.testing.assert_allclose(out[i], base[i], atol=1e-5)
    wa = walls["A: batched=4 depth=1"]
    wb = walls["B: batched=8 depth=2"]
    print(f"results identical across all configs; "
          f"B vs A (same cohort shape, +1 cohort in flight): "
          f"{wa - wb:+.2f} s ({(wa - wb) / wa * 100:+.0f}%)")


if __name__ == "__main__":
    main()
