#!/usr/bin/env python
"""Episode assembly — CLI parity with
/root/reference/dataset/process_episodes_real.py (filters + detections ->
data.feather with the exact wide-column schema). Inverse-action labels
come from a converted reference checkpoint (--inverse-model) or are
skipped."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="process episodes (TPU)")
    parser.add_argument("-g", "--gpu", default="0", help="ignored (compat)")
    parser.add_argument("--location", default="dataset")
    parser.add_argument("--inverse-model", default="",
                        help="inverse_model.torch checkpoint to convert")
    parser.add_argument("--inverse-flax", default="",
                        help="models dir of an inverse model trained by "
                             "this framework (train/inverse.py sample<N>"
                             ".ckpt files)")
    parser.add_argument("--image-size", type=int, default=224,
                        help="inverse-labeler input resolution")
    args = parser.parse_args()

    from video_dqn_tpu.data.episodes import make_inverse_labeler, process_episodes

    labeler = None
    if args.inverse_flax:
        from video_dqn_tpu.train.inverse import load_inverse_checkpoint

        model, state = load_inverse_checkpoint(
            args.inverse_flax, image_size=args.image_size)
        labeler = make_inverse_labeler(model, state.params, state.batch_stats)
    elif args.inverse_model:
        from video_dqn_tpu.models.inverse import InverseActionModel
        from video_dqn_tpu.models.torch_convert import (
            convert_inverse,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.inverse_model)
        params, stats = convert_inverse(sd)
        labeler = make_inverse_labeler(InverseActionModel(), params, stats)
    else:
        print("WARNING: no --inverse-model; feather will lack inverse_actions")

    out = process_episodes(args.location, inverse_labeler=labeler,
                           image_size=args.image_size)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
