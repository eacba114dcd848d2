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
    parser.add_argument("config", help="folder containing config.yml")
    args = parser.parse_args()

    from video_dqn_tpu.core import ExperimentConfig, latest_checkpoint_step
    from video_dqn_tpu.train import run_train

    config = ExperimentConfig(args.config, remove=args.delete, resume=args.resume)
    config.write_config_log()

    resume_from = -1
    if args.resume:
        latest = latest_checkpoint_step(config.models_dir)
        if latest is not None:
            print(f"Resuming from: {latest}")
            resume_from = latest
    run_train(config, resume_from)


if __name__ == "__main__":
    main()
