"""Headline benchmark: Q-network double-DQN training frames/sec/chip.

Runs the FULL jitted train step (3 ResNet18 forwards + backward + Adam +
conditional target sync, uint8->normalize fused on device) on the real
TPU chip with the published real_data architecture (extra_capacity,
single-frame, 224x224) in bfloat16 at batch 512, on synthetic
device-resident batches, dispatched in scan chunks of 10 steps per XLA
program (the production DEVICE_DATASET dispatch shape) — isolating the
compute path the reference runs per sample at batch 16 on a CUDA GPU
(train_q_network.py:98,126-181) from per-step dispatch cost.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference's CUDA GPU is not available in this
environment; the denominator is the same algorithm measured in PyTorch on
this host's CPU via scripts/measure_torch_baseline.py (see BASELINE.md for
the number's provenance and the caveat).
"""

import json
import os
import threading
import time

# Hang watchdog: a dropped axon tunnel blocks device init/execution
# indefinitely (observed: an eval run frozen 80+ min mid-workload). If the
# bench hasn't printed its line by the deadline, emit an honest error JSON
# line and exit non-zero rather than hanging the harness. Generous bound:
# a cold remote compile of the full step takes ~10 min.
WATCHDOG_S = float(os.environ.get("VDQN_BENCH_WATCHDOG_S", 2700))
_done = threading.Event()


def _watchdog():
    if not _done.wait(WATCHDOG_S):
        print(json.dumps({
            "metric": "qnet_train_frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "error": f"watchdog: no result after {WATCHDOG_S:.0f}s — "
                     "TPU/tunnel unreachable or hung",
        }), flush=True)
        os._exit(2)

# Measured 2026-08-16 on this host (1-core CPU, torch 2.13.0+cpu), batch 16:
# see BASELINE.md "Measured baselines".
TORCH_CPU_BASELINE_FPS = None  # filled from BASELINE.md if present


def _read_baseline():
    try:
        with open("BASELINE.md") as f:
            for line in f:
                if line.startswith("TORCH_CPU_FPS="):
                    return float(line.split("=", 1)[1])
    except Exception:
        pass
    return None


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    # persistent compile cache: the axon tunnel's remote compile of the
    # full train step can take minutes cold; cached runs start in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from video_dqn_tpu.data.synthetic import synthetic_batch
    from video_dqn_tpu.models.qnet import build_qnet
    from video_dqn_tpu.parallel import make_mesh
    from video_dqn_tpu.train.dqn import (
        TrainState,
        make_train_step,
        state_shardings,
    )
    from video_dqn_tpu.core import get_cfg_defaults
    import optax

    # probed per-step-dispatch (stop-grad step): 5986 at 512, 5935 at 768,
    # 6005 at 1024 — flat past 512; re-probed scan-chunked (dispatch-free,
    # 2026-08-19): 6163.6 at 512 vs 6170.1 at 1024 — +0.1%, noise; keep
    # the smaller footprint.
    # VDQN_BENCH_BATCH overrides for probes.
    batch_size = int(os.environ.get("VDQN_BENCH_BATCH", 512))
    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "extra_capacity"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.LOSS_CLIP = "rect"
    cfg.GAMMA = 0.99
    cfg.LEARNING_RATE = 1e-4

    mesh = make_mesh(len(jax.devices()), 1)
    model = build_qnet(cfg)
    from video_dqn_tpu.models.qnet import init_qnet

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
    state = jax.device_put(state, state_shardings(mesh, state))

    # scan-chunked dispatch, the production DEVICE_DATASET shape
    # (train/dqn.make_scan_device_step): CHUNK steps per XLA program, so
    # the timing isolates the compute path from per-step dispatch cost
    # (~13 ms/step through the tunneled runtime; sub-ms co-located).
    CHUNK = 10
    body_fn = make_train_step(model, cfg, tx)

    def scan_steps(state, batch):
        def body(st, _):
            return body_fn(st, batch)

        st, ms = jax.lax.scan(body, state, None, length=CHUNK)
        return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

    step_fn = jax.jit(scan_steps, donate_argnums=(0,))

    host = synthetic_batch(batch_size=batch_size, num_frames=1, image_size=224)
    from video_dqn_tpu.parallel import shard_batch

    batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in host.items()})

    # compile + warmup
    state, m = step_fn(state, batch)
    jax.block_until_ready(m["loss"])
    state, m = step_fn(state, batch)
    jax.block_until_ready(m["loss"])

    dispatches = 2
    iters = dispatches * CHUNK
    t0 = time.perf_counter()
    for _ in range(dispatches):
        state, m = step_fn(state, batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    fps_per_chip = batch_size * iters / dt / n_chips
    baseline = _read_baseline()
    vs = round(fps_per_chip / baseline, 2) if baseline else None

    # MFU: XLA-reported FLOPs per step vs the chip's peak (VERDICT round 1,
    # weak item 3: the torch-CPU ratio alone flatters; report utilization).
    mfu = flops_per_step = None
    try:
        # cost-analyze the SINGLE-step program: XLA's cost analysis counts
        # a while/scan body once regardless of trip count, so analyzing the
        # chunked program would be ambiguous across versions.
        one_step = jax.jit(body_fn)
        cost = one_step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        peak = _peak_flops(jax.devices()[0])
        if flops_per_step > 0 and peak:
            steps_per_sec = iters / dt
            mfu = round(flops_per_step * steps_per_sec / (n_chips * peak), 4)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "qnet_train_frames_per_sec_per_chip",
                "value": round(fps_per_chip, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": vs,
                # vs_baseline is a CROSS-HARDWARE ratio: the reference's CUDA
                # GPU is unavailable here, so the denominator is the same
                # algorithm in torch on this host's 1-core CPU (BASELINE.md).
                # A reference-era consumer GPU runs ~100-300 f/s on this
                # workload; vs_ref_gpu_est uses the midpoint of that range.
                "baseline_kind": "torch_cpu_1core",
                "vs_ref_gpu_est": (
                    round(fps_per_chip / 200.0, 1) if fps_per_chip else None
                ),
                "mfu": mfu,
                "flops_per_step": flops_per_step,
            }
        ),
        flush=True,
    )
    _done.set()


def _peak_flops(device) -> float:
    """Peak dense bf16 FLOP/s for the device (public spec numbers)."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5e": 197e12,       # TPU v5e (v5 lite)
        "v5 lite": 197e12,
        "v5p": 459e12,
        "v4": 275e12,
        "v6e": 918e12,
        "trillium": 918e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 0.0


if __name__ == "__main__":
    main()
