#!/usr/bin/env python
"""Frame extraction + indoor/person filtering — CLI parity with
/root/reference/dataset/extract_frames.py (`--dump` extracts frames at
0.5 fps; the filter pass writes filter_out/<vid>_filters.npy with
skip-if-exists resume). Decode uses OpenCV (no ffmpeg binary in this
image); filtering runs the Flax AlexNet-Places365 + the in-repo Mask R-CNN
person detector as batched TPU programs.

Without weights the pass would silently be a no-op (every frame kept), so
it REFUSES to run unless --allow-passthrough is given explicitly
(the reference always filters: extract_frames.py:144-168)."""

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
    parser.add_argument("--detector-weights", default="",
                        help="torch Mask R-CNN checkpoint for the person filter")
    parser.add_argument("--stub-detector", action="store_true",
                        help="use the synthetic stub person detector (tests)")
    parser.add_argument("--allow-passthrough", action="store_true",
                        help="explicitly allow running WITHOUT filter weights "
                             "(marks every frame indoor/person-free)")
    args = parser.parse_args()

    from video_dqn_tpu.data.video import extract_all_frames

    if args.dump:
        done = extract_all_frames(args.location, args.frames, fps=0.5)
        print(f"extracted {len(done)} videos")
        return

    import numpy as np

    from video_dqn_tpu.data.filters import make_indoor_classifier, run_filter_pass

    have_indoor = bool(args.places_weights)
    have_person = bool(args.detector_weights or args.stub_detector)
    if not (have_indoor and have_person) and not args.allow_passthrough:
        missing = []
        if not have_indoor:
            missing.append("--places-weights")
        if not have_person:
            missing.append("--detector-weights")
        sys.exit(
            "ERROR: filtering without " + " and ".join(missing) + " would "
            "silently keep every frame (no-op filter). Provide the weights "
            "(scripts/convert_weights.py documents the source URLs) or pass "
            "--allow-passthrough to run unfiltered on purpose."
        )

    if have_indoor:
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
        print("WARNING: --allow-passthrough and no --places-weights; "
              "treating all frames as indoor")
        indoor = lambda images: np.ones(len(images))

    if have_person:
        # person filter = the in-repo Mask R-CNN (score-sorted labels per
        # image feed filters.person_in_top5, reference :144-148)
        if args.stub_detector:
            from video_dqn_tpu.data.detect import StubDetector

            detector = StubDetector()
        else:
            from video_dqn_tpu.models.detector import load_detector

            detector = load_detector(args.detector_weights)

        def person(images):
            outs = detector(images)
            return [
                d["classes"][np.argsort(-d["scores"])] for d in outs
            ]
    else:
        print("WARNING: --allow-passthrough and no person detector; "
              "treating all frames as person-free")
        person = lambda images: [[] for _ in images]

    written = run_filter_pass(args.frames, args.out, indoor, person)
    print(f"filtered {len(written)} videos")


if __name__ == "__main__":
    main()
