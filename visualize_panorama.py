#!/usr/bin/env python
"""Panorama visualization CLI — entry-point parity with
/root/reference/visualize_panorama.py: strip rendering (join_images +
live env capture) and, with --analysis, the value/distance correlation
figure (vis_panorama, reference :70-215; the reference file's
pdb-interactive figure-height bisection is not replicated).

Usage:
  python visualize_panorama.py --out strip.png [--size 224]
  python visualize_panorama.py --analysis corr.png [--size 224]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="render a panorama strip")
    parser.add_argument("--out", default="panorama.png")
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--rotations", type=int, default=12)
    parser.add_argument(
        "--analysis", default="",
        help="write the value/distance correlation figure here instead of "
             "a plain strip (reference vis_panorama); scores come from a "
             "randomly-initialized flagship Q-net unless --model-config is "
             "given",
    )
    parser.add_argument(
        "--model-config", default="",
        help="experiment folder of a trained model to score the analysis "
             "views (latest checkpoint)",
    )
    args = parser.parse_args()

    from PIL import Image

    from video_dqn_tpu.sim.fake_env import FakeNavEnv
    from video_dqn_tpu.viz.panorama import panorama_strip

    env = FakeNavEnv(image_size=args.size)
    env.reset(reachable=False)

    if args.analysis:
        import jax

        from video_dqn_tpu.sim.gibson import CLASS_LABELS
        from video_dqn_tpu.viz.panorama import make_allclass_scorer, vis_panorama

        if args.model_config:
            from video_dqn_tpu.core import latest_checkpoint_step
            from video_dqn_tpu.core.experiment import ExperimentConfig
            from video_dqn_tpu.eval.policy_config import get_eval_defaults
            from video_dqn_tpu.eval.runner import load_eval_model

            mc = ExperimentConfig(args.model_config, resume=True,
                                  tensorboard=False)
            ec = get_eval_defaults()
            ec.MODEL_NUMBER = latest_checkpoint_step(mc.models_dir)
            model, params, batch_stats = load_eval_model(ec, mc)
        else:
            from video_dqn_tpu.core import get_cfg_defaults
            from video_dqn_tpu.models.qnet import build_qnet, init_qnet

            cfg = get_cfg_defaults()
            cfg.PANORAMA = False
            cfg.ARCHITECTURE = "extra_capacity"
            model = build_qnet(cfg)
            params, batch_stats = init_qnet(
                model, jax.random.key(0), image_size=args.size
            )
        scorer = make_allclass_scorer(model, params, batch_stats,
                                      image_size=args.size)
        # each class gets a sampled reachable goal in the maze
        goals_by_class = [[env.sample_reachable_goal()]
                          for _ in CLASS_LABELS]
        fig, corrs = vis_panorama(
            env, scorer, goals_by_class, num=args.rotations,
            class_names=CLASS_LABELS, out_path=args.analysis,
            probe_steps=4,
        )
        for name, corr in zip(CLASS_LABELS, corrs):
            print(f"corr[{name}] = {corr:.3f}")
        print(f"wrote {args.analysis}")
        return

    strip, _ = panorama_strip(env, scorer=None, num_rotations=args.rotations)
    Image.fromarray(strip).save(args.out)
    print(f"wrote {args.out} ({strip.shape})")


if __name__ == "__main__":
    main()
