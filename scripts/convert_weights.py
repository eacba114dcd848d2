#!/usr/bin/env python
"""One-command converter for every pretrained checkpoint the reference
pipeline consumes, from locally provided files (this container has no
network egress — the download URLs below are the reference's own):

  kind            source (reference download site)                              reference use
  --------------  ------------------------------------------------------------  -----------------------------
  resnet18        https://download.pytorch.org/models/resnet18-5c106cde.pth     Q-net + inverse backbones
                                                                                 (archs/HabitatDQNMultiAction.py:12)
  alexnet_places  http://places2.csail.mit.edu/models_places365/                 indoor/outdoor frame filter
                  alexnet_places365.pth.tar                                      (dataset/extract_frames.py:56-69)
  inverse         https://www.dropbox.com/.../inverse_model.torch                action pseudo-labeling
                                                                                 (dataset/process_episodes_real.py:84-88)
  qnet            https://www.dropbox.com/.../vlv_model.torch                    published eval model
                                                                                 (evaluation/runner.py:52-57)
  maskrcnn        detectron2 model zoo mask_rcnn_R_50_FPN_3x                     reward labeling + eval fusion
                                                                                 (dataset/detect_real_videos.py:30-35)

Usage:
  python scripts/convert_weights.py --kind qnet --input vlv_model.torch \
      --output weights/vlv_qnet.npz [--basic] [--panorama]

Output is an .npz with flattened `params/...` and `batch_stats/...` keys
(float32), loadable with load_npz_tree() below. Training can also consume
the raw torchvision .pth directly via the BACKBONE_WEIGHTS config key, and
eval consumes .torch checkpoints directly via PRETRAINED_MODEL_LOCATION —
this script exists to validate a conversion once and snapshot it in a
torch-free format.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v, np.float32)
    return out


def unflatten_tree(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_npz_tree(path):
    """Returns (params, batch_stats) pytrees from a converted .npz."""
    flat = dict(np.load(path))
    tree = unflatten_tree(flat)
    return tree.get("params", {}), tree.get("batch_stats", {})


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--kind", required=True,
                    choices=["resnet18", "alexnet_places", "inverse", "qnet",
                             "maskrcnn"])
    ap.add_argument("--input", required=True, help="torch checkpoint file")
    ap.add_argument("--output", required=True, help=".npz to write")
    ap.add_argument("--basic", action="store_true",
                    help="qnet: basic head instead of extra_capacity")
    ap.add_argument("--panorama", action="store_true",
                    help="qnet: 4-frame panorama head")
    args = ap.parse_args()

    from video_dqn_tpu.models.torch_convert import (
        convert_alexnet_places,
        convert_inverse,
        convert_qnet,
        convert_resnet18,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(args.input)
    if args.kind == "resnet18":
        params, stats = convert_resnet18(sd, include_fc=True)
    elif args.kind == "alexnet_places":
        params, stats = convert_alexnet_places(sd)
    elif args.kind == "inverse":
        params, stats = convert_inverse(sd)
    elif args.kind == "qnet":
        params, stats = convert_qnet(
            sd, extra_capacity=not args.basic,
            num_frames=4 if args.panorama else 1,
        )
    else:
        from video_dqn_tpu.models.detector.convert import convert_maskrcnn

        params, stats = convert_maskrcnn(sd)

    flat = flatten_tree({"params": params, "batch_stats": stats})
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    np.savez(args.output, **flat)
    n_arrays = len(flat)
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    print(f"{args.kind}: wrote {args.output} ({n_arrays} arrays, "
          f"{n_params/1e6:.2f}M values)")


if __name__ == "__main__":
    main()
