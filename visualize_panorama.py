#!/usr/bin/env python
"""Panorama visualization CLI — entry-point parity with
/root/reference/visualize_panorama.py's strip rendering (join_images +
live env capture; the reference file's pdb-interactive paper tooling is
not replicated).

Usage:
  python visualize_panorama.py --out strip.png [--size 224]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="render a panorama strip")
    parser.add_argument("--out", default="panorama.png")
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--rotations", type=int, default=12)
    args = parser.parse_args()

    from PIL import Image

    from video_dqn_tpu.sim.fake_env import FakeNavEnv
    from video_dqn_tpu.viz.panorama import panorama_strip

    env = FakeNavEnv(image_size=args.size)
    env.reset(reachable=False)
    strip, _ = panorama_strip(env, scorer=None, num_rotations=args.rotations)
    Image.fromarray(strip).save(args.out)
    print(f"wrote {args.out} ({strip.shape})")


if __name__ == "__main__":
    main()
