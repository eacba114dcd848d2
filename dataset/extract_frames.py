#!/usr/bin/env python
"""Frame extraction + indoor/person filtering — CLI parity with
/root/reference/dataset/extract_frames.py (`--dump` extracts frames at
0.5 fps; the filter pass writes filter_out/<vid>_filters.npy with
skip-if-exists resume). Decode uses OpenCV (no ffmpeg binary in this
image); filtering runs the Flax AlexNet-Places365 + an injectable person
detector as batched TPU programs. Without converted pretrained weights
(--places-weights) the filter pass marks every frame indoor/person-free so
the downstream pipeline stays runnable."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="filter frames (TPU)")
    parser.add_argument("-g", "--gpu", default="0", help="ignored (compat)")
    parser.add_argument("-d", "--dump", action="store_true",
                        help="dump frames from video files")
    parser.add_argument("--location", default="dataset/videos")
    parser.add_argument("--frames", default="dataset/frames")
    parser.add_argument("--out", default="dataset/filter_out")
    parser.add_argument("--places-weights", default="",
                        help="torch alexnet_places365 checkpoint to convert")
    args = parser.parse_args()

    from video_dqn_tpu.data.video import extract_all_frames

    if args.dump:
        done = extract_all_frames(args.location, args.frames, fps=0.5)
        print(f"extracted {len(done)} videos")
        return

    import numpy as np

    from video_dqn_tpu.data.filters import make_indoor_classifier, run_filter_pass

    if args.places_weights:
        import jax

        from video_dqn_tpu.models.alexnet_places import AlexNetPlaces365
        from video_dqn_tpu.models.torch_convert import (
            convert_alexnet_places,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.places_weights)
        params, _ = convert_alexnet_places(sd)
        model = AlexNetPlaces365()
        indoor = make_indoor_classifier(model, params)
    else:
        print("WARNING: no --places-weights; treating all frames as indoor")
        indoor = lambda images: np.ones(len(images))

    person = lambda images: [[] for _ in images]  # no person detector weights
    written = run_filter_pass(args.frames, args.out, indoor, person)
    print(f"filtered {len(written)} videos")


if __name__ == "__main__":
    main()
