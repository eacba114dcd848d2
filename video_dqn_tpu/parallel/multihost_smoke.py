"""Multi-host train-step smoke: one coordinated process of a DCN-spanning
run.

Executes the SURVEY section-5 distributed backend for real: each process
calls `multihost.initialize` (jax.distributed), joins the global
('data','model') mesh spanning every process's devices, feeds ONLY its own
batch shard (`global_batch_slice` + `multihost.make_global_array`),
runs one full double-DQN train step, and prints the (replicated) loss —
which must agree bit-for-bit across processes, since every process executes
the same XLA program over the same global data.

The reference has no distributed layer at all (single GPU via
CUDA_VISIBLE_DEVICES; SURVEY.md section 2 communication inventory). Run two
coordinated copies locally with:

    python -m video_dqn_tpu.parallel.multihost_smoke \
        --coordinator localhost:37711 --num-processes 2 --process-id 0 &
    python -m video_dqn_tpu.parallel.multihost_smoke \
        --coordinator localhost:37711 --num-processes 2 --process-id 1

(CPU backend: each process provisions --local-devices virtual CPU devices
and the cross-process collectives ride gloo.)
tests/test_runtime.py::test_multihost_two_process_train_step does exactly
this and asserts both processes report the same finite loss.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", required=True,
                        help="host:port of process 0's coordinator service")
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--local-devices", type=int, default=4,
                        help="virtual CPU devices to provision per process "
                             "(ignored on real TPU hosts)")
    parser.add_argument("--mesh-model", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=16,
                        help="GLOBAL batch size (split across processes)")
    parser.add_argument("--image-size", type=int, default=96)
    parser.add_argument("--platform", choices=("cpu", "native"), default="cpu",
                        help="cpu: force the virtual-CPU platform with gloo "
                             "cross-process collectives (works anywhere, "
                             "overrides any ambient JAX_PLATFORMS); native: "
                             "leave the platform alone for a real multi-host "
                             "accelerator fleet")
    args = parser.parse_args(argv)

    import jax

    from video_dqn_tpu.parallel import multihost

    if args.platform == "cpu":
        # must precede the first backend init (XLA_FLAGS parses once);
        # overrides the ambient platform unconditionally — this container
        # exports JAX_PLATFORMS=axon, and half-forcing (config update
        # without the XLA_FLAGS device count) yields a 1-device CPU host
        multihost.force_virtual_cpu(args.local_devices)

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, (
        f"joined {jax.process_count()} processes, expected "
        f"{args.num_processes} — jax.distributed did not form the cluster"
    )

    import jax.numpy as jnp
    import numpy as np
    import optax

    from video_dqn_tpu.data.synthetic import synthetic_batch
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.parallel import batch_sharding, make_mesh
    from video_dqn_tpu.train.dqn import TrainState, jit_train_step

    n_devices = len(jax.devices())
    n_model = args.mesh_model if n_devices % args.mesh_model == 0 else 1
    mesh = make_mesh(n_devices // n_model, n_model)

    from video_dqn_tpu.core import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.PANORAMA = False
    cfg.ARCHITECTURE = "extra_capacity"
    cfg.USE_INVERSE_ACTIONS = True
    cfg.LOSS_CLIP = "rect"
    cfg.GAMMA = 0.99
    cfg.LEARNING_RATE = 1e-4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_MODEL = n_model

    model = build_qnet(cfg)
    params, batch_stats = init_qnet(
        model, jax.random.key(0), image_size=args.image_size
    )
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

    # every process materializes the same deterministic GLOBAL batch, then
    # feeds only its own slice — the production contract where each host
    # decodes a disjoint shard of the input stream
    host_batch = synthetic_batch(
        batch_size=args.batch_size, num_frames=1, image_size=args.image_size
    )
    start, size = multihost.global_batch_slice(args.batch_size)
    sharding = batch_sharding(mesh)
    batch = {
        k: multihost.make_global_array(
            sharding,
            (args.batch_size,) + np.asarray(v).shape[1:],
            np.asarray(v)[start : start + size],
            start,
        )
        for k, v in host_batch.items()
    }

    state, metrics = step_fn(state, batch)
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss
    # parsed by the test: both processes must print the identical value
    print(
        f"MULTIHOST_LOSS process={jax.process_index()}/{jax.process_count()} "
        f"mesh=({n_devices // n_model}x{n_model}) loss={loss!r}",
        flush=True,
    )
    if multihost.is_primary():
        print("MULTIHOST_PRIMARY_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
