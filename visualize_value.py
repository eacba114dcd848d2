#!/usr/bin/env python
"""Value-map visualization CLI — entry-point parity with
/root/reference/visualize_value.py: render per-class Q-value heatmaps for
a checkpoint over a pre-rendered grid (VISUALIZATION_DATA_ROOT layout).

Usage:
  python visualize_value.py <experiment-folder> --data-root <grid-dir>
      [--model-number N] [--out out_dir] [--resolution R]
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="render value maps (TPU)")
    parser.add_argument("config", help="experiment folder with config.yml")
    parser.add_argument("--data-root", required=True,
                        help="grid folder of row-col-orientation.jpg")
    parser.add_argument("--model-number", type=int, default=None)
    parser.add_argument("--out", default="value_maps")
    parser.add_argument("--resolution", type=int, default=1500)
    parser.add_argument("--image-size", type=int, default=224)
    args = parser.parse_args()

    import jax
    import numpy as np
    from PIL import Image

    from video_dqn_tpu.core import ExperimentConfig, latest_checkpoint_step
    from video_dqn_tpu.eval.runner import load_eval_model
    from video_dqn_tpu.eval.policy_config import get_eval_defaults
    from video_dqn_tpu.viz.value_map import build_value_maps, render_value_map

    config = ExperimentConfig(args.config, resume=True, tensorboard=False)
    number = args.model_number or latest_checkpoint_step(config.models_dir)
    ecfg = get_eval_defaults()
    ecfg.MODEL_NUMBER = int(number)
    model, params, stats = load_eval_model(ecfg, config)

    maps, agg, free = build_value_maps(
        model, params, stats, args.data_root,
        panorama=(config.PANORAMA or config.PREVIOUS_IMAGES),
        resolution=args.resolution, image_size=args.image_size,
    )
    os.makedirs(args.out, exist_ok=True)
    from video_dqn_tpu.sim.gibson import CLASS_LABELS

    for direct in [0, 1, 2, 3, "max"]:
        for i, label in enumerate(CLASS_LABELS):
            cur = agg[:, :, i] if direct == "max" else maps[direct][:, :, i]
            img = render_value_map(cur, free)
            Image.fromarray(img).save(
                os.path.join(args.out, f"{label}_{direct}.png")
            )
    print(f"wrote {5 * 5} maps to {args.out}")


if __name__ == "__main__":
    main()
