#!/usr/bin/env python
"""Q-network training CLI — public entry point parity with the reference
(`python train_q_network.py <config-folder> [-r] [-d]`,
/root/reference/train_q_network.py:253-296). The -g GPU flag is accepted
for drop-in compatibility but ignored (device selection is the JAX
platform; use TPU.MESH_* config keys for multi-chip layout).
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="train q network (TPU)")
    parser.add_argument("-g", "--gpu", dest="gpu", default="0",
                        help="ignored (reference-CLI compatibility)")
    parser.add_argument("-r", "--resume", action="store_true",
                        help="resume from the latest sample<N> checkpoint")
    parser.add_argument("-d", "--delete", action="store_true",
                        help="delete stored run logs")
    parser.add_argument("--log-every", type=int, default=100,
                        help="metrics cadence in steps (reference logged "
                             "each 100, train_q_network.py:236-238)")
    # ---- multi-host fleet flags (no reference equivalent: the reference
    # is single-process/single-GPU, train_q_network.py:275; SURVEY §5
    # names the DCN-spanning backend as a first-class TPU addition) ----
    parser.add_argument("--coordinator", default="",
                        help="host:port of process 0's jax.distributed "
                             "coordinator; presence turns on multi-host "
                             "mode (every process runs this same CLI)")
    parser.add_argument("--num-processes", type=int, default=0)
    parser.add_argument("--process-id", type=int, default=-1)
    parser.add_argument("--multihost-platform", choices=("cpu", "native"),
                        default="native",
                        help="cpu: force the virtual-CPU platform with "
                             "gloo collectives (tests/CI); native: real "
                             "accelerator fleet")
    parser.add_argument("--local-devices", type=int, default=4,
                        help="virtual CPU devices per process (cpu "
                             "platform only)")
    parser.add_argument("config", help="folder containing config.yml")
    args = parser.parse_args()

    if args.coordinator:
        if args.num_processes <= 0 or args.process_id < 0:
            parser.error("--coordinator requires --num-processes and "
                         "--process-id")
        from video_dqn_tpu.parallel import multihost

        if args.multihost_platform == "cpu":
            multihost.force_virtual_cpu(args.local_devices)
        multihost.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        import jax

        if jax.process_count() != args.num_processes:
            raise RuntimeError(
                f"joined {jax.process_count()} processes, expected "
                f"{args.num_processes} — jax.distributed did not form "
                "the cluster")

    from video_dqn_tpu.core import ExperimentConfig, latest_checkpoint_step
    from video_dqn_tpu.train import run_train

    # metrics/config-log side effects are primary-only in a fleet; every
    # process still loads the same frozen config tree
    primary = args.process_id <= 0
    config = ExperimentConfig(args.config, remove=args.delete and primary,
                              resume=args.resume, tensorboard=primary)
    if primary:
        config.write_config_log()

    resume_from = -1
    if args.resume:
        latest = latest_checkpoint_step(config.models_dir)
        if latest is not None:
            print(f"Resuming from: {latest}")
            resume_from = latest

    # value-map rendering at checkpoints when a pre-rendered grid root is
    # configured (the reference's visualize_house hook,
    # train_q_network.py:70-81 — crash-gated properly here)
    visualize_hook = None
    if config.VISUALIZATION_DATA_ROOT:
        import os

        import jax

        from video_dqn_tpu.viz.value_map import build_value_maps, render_value_map
        from video_dqn_tpu.sim.gibson import CLASS_LABELS

        grids = [
            d for d in sorted(os.listdir(config.VISUALIZATION_DATA_ROOT))
            if os.path.isdir(os.path.join(config.VISUALIZATION_DATA_ROOT, d))
        ]

        def visualize_hook(model, state, sample_number):
            params = jax.device_get(state.params)
            stats = jax.device_get(state.batch_stats)
            for name in grids:
                root = os.path.join(config.VISUALIZATION_DATA_ROOT, name)
                maps, agg, free = build_value_maps(
                    model, params, stats, root,
                    panorama=(config.PANORAMA or config.PREVIOUS_IMAGES),
                )
                for i, label in enumerate(CLASS_LABELS):
                    img = render_value_map(agg[:, :, i], free)
                    config.writer.add_image(
                        f"value_map_{name}/{label}", img, sample_number
                    )

    run_train(config, resume_from, log_every=args.log_every,
              visualize_hook=visualize_hook)


if __name__ == "__main__":
    main()
