#!/usr/bin/env python
"""Reward-detection pass — CLI parity with
/root/reference/dataset/detect_real_videos.py (batched detector over all
frames -> frames/real_detections_raw.npy). The detector is the Flax
Mask R-CNN family when weights are provided; --stub runs the synthetic
detector so the pipeline is exercisable without pretrained weights."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="detect target objects (TPU)")
    parser.add_argument("-g", "--gpu", default="0", help="ignored (compat)")
    parser.add_argument("--location", default="dataset")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--stub", action="store_true",
                        help="use the synthetic stub detector")
    parser.add_argument("--weights", default="",
                        help="torch detector checkpoint to convert")
    parser.add_argument("--image-size", type=int, default=224,
                        help="detector input resolution")
    args = parser.parse_args()

    from video_dqn_tpu.data.detect import StubDetector, run_detection_pass

    if args.stub or not args.weights:
        if not args.stub:
            print("WARNING: no --weights; using the stub detector")
        detector = StubDetector()
    else:
        from video_dqn_tpu.models.detector import load_detector

        detector = load_detector(args.weights)

    out = os.path.join(args.location, "frames", "real_detections_raw.npy")
    results = run_detection_pass(
        os.path.join(args.location, "frames"), detector, out_path=out,
        batch_size=args.batch, image_size=args.image_size,
    )
    print(f"detected over {len(results)} videos -> {out}")


if __name__ == "__main__":
    main()
