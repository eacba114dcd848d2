"""PyTorch state_dict -> Flax parameter-tree converters.

Pretrained-weight parity is a hard requirement (SURVEY.md section 7): the
reference uses torchvision-pretrained ResNet18/AlexNet backbones and ships
trained Q/inverse checkpoints (.torch files holding `model_state_dict`,
/root/reference/train_q_network.py:241-247). These converters map those
tensors onto the NHWC Flax modules in this package:

  * conv weights: OIHW -> HWIO
  * dense weights: (out, in) -> (in, out)
  * dense layers that consume a flattened conv map: torch flattens NCHW
    (channel-major); our modules flatten NHWC, so the kernel's input rows
    are re-ordered per (C,H,W) block (per frame for panorama stacks)
  * BatchNorm: weight/bias -> scale/bias params; running_mean/var -> batch_stats

Everything here runs on host numpy; no torch import is required unless a
.torch file is being read (load_torch_state_dict).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def dense_kernel(w) -> np.ndarray:
    return _np(w).transpose(1, 0)  # (out,in) -> (in,out)


def dense_kernel_chw(w, c: int, h: int, wdim: int, frames: int = 1) -> np.ndarray:
    """Reorder a torch Linear kernel whose input is a flattened conv map.

    torch input layout per frame: (C,H,W) flattened; ours: (H,W,C). The
    panorama head concatenates per-frame blocks, so reorder each block
    independently."""
    wt = _np(w)  # (out, frames*c*h*w)
    out_dim = wt.shape[0]
    assert wt.shape[1] == frames * c * h * wdim, (wt.shape, (frames, c, h, wdim))
    blocks = wt.reshape(out_dim, frames, c, h, wdim)
    blocks = blocks.transpose(0, 1, 3, 4, 2)  # (out, frames, h, w, c)
    return blocks.reshape(out_dim, frames * h * wdim * c).transpose(1, 0)


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_resnet18(sd: Dict, prefix: str = "", include_fc: bool = False):
    """Convert torchvision resnet18 naming (conv1, bn1, layerS.B.*, fc)
    to the ResNet18 module tree (conv1, bn1, layerS_B/*, fc).
    Returns (params, batch_stats)."""
    p = (lambda k: f"{prefix}{k}") if prefix else (lambda k: k)
    params: Dict = {"conv1": {"kernel": conv_kernel(sd[p("conv1.weight")])}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, p("bn1"))
    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            tname = f"layer{stage}.{block}"
            bp: Dict = {}
            bs: Dict = {}
            bp["conv1"] = {"kernel": conv_kernel(sd[p(f"{tname}.conv1.weight")])}
            bp["bn1"], bs["bn1"] = _bn(sd, p(f"{tname}.bn1"))
            bp["conv2"] = {"kernel": conv_kernel(sd[p(f"{tname}.conv2.weight")])}
            bp["bn2"], bs["bn2"] = _bn(sd, p(f"{tname}.bn2"))
            if p(f"{tname}.downsample.0.weight") in sd:
                bp["downsample_conv"] = {
                    "kernel": conv_kernel(sd[p(f"{tname}.downsample.0.weight")])
                }
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, p(f"{tname}.downsample.1")
                )
            params[name] = bp
            stats[name] = bs
    if include_fc and p("fc.weight") in sd:
        params["fc"] = {
            "kernel": dense_kernel(sd[p("fc.weight")]),
            "bias": _np(sd[p("fc.bias")]),
        }
    return params, stats


def convert_qnet(sd: Dict, extra_capacity: bool, num_frames: int,
                 head_hw: Tuple[int, int] = (5, 5)):
    """Convert a reference HabitatDQNMultiAction state_dict
    (/root/reference/archs/HabitatDQNMultiAction.py:30-34: `resnet.*` backbone,
    `features.8` extra conv, `top.{0,2,4}` MLP — or `top` single Linear for
    basic) to the HabitatDQN module tree. Returns (params, batch_stats)."""
    rparams, rstats = convert_resnet18(sd, prefix="resnet.")
    params: Dict = {"resnet": rparams}
    stats: Dict = {"resnet": rstats}
    if extra_capacity:
        params["head_conv"] = {
            "kernel": conv_kernel(sd["features.8.weight"]),
            "bias": _np(sd["features.8.bias"]),
        }
        params["top_dense1"] = {
            "kernel": dense_kernel_chw(sd["top.0.weight"], 64, head_hw[0],
                                       head_hw[1], num_frames),
            "bias": _np(sd["top.0.bias"]),
        }
        params["top_dense2"] = {
            "kernel": dense_kernel(sd["top.2.weight"]),
            "bias": _np(sd["top.2.bias"]),
        }
        params["top_dense3"] = {
            "kernel": dense_kernel(sd["top.4.weight"]),
            "bias": _np(sd["top.4.bias"]),
        }
    else:
        params["top_dense1"] = {
            "kernel": dense_kernel(sd["top.weight"]),
            "bias": _np(sd["top.bias"]),
        }
    return params, stats


def convert_inverse(sd: Dict):
    """Convert a reference inverse_action2.model state_dict
    (/root/reference/archs/inverse_action2.py:50-70). The trunk is stored
    as `resnet18.N.*` Sequential indices (0=conv1, 1=bn1, 4..7=layers)."""
    remap = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
             "6": "layer3", "7": "layer4"}
    trunk_sd = {}
    for k, v in sd.items():
        if not k.startswith("resnet18."):
            continue
        rest = k[len("resnet18."):]
        idx, _, tail = rest.partition(".")
        trunk_sd[f"{remap[idx]}.{tail}" if remap[idx].startswith("layer") else f"{remap[idx]}.{tail}"] = v
    # normalize: conv1.weight arrives as 'conv1..weight' if tail empty — fix keys
    trunk_sd = {k.replace("..", "."): v for k, v in trunk_sd.items()}
    # trunk_sd now uses torchvision naming minus prefix, but conv1/bn1 keys
    # carry a trailing piece like 'conv1.weight' already; layers are
    # 'layerS.B.conv1.weight'.
    rparams, rstats = convert_resnet18(trunk_sd)
    params = {"resnet": rparams}
    stats = {"resnet": rstats}
    params["conv1"] = {"kernel": conv_kernel(sd["conv1.weight"]), "bias": _np(sd["conv1.bias"])}
    params["conv2"] = {"kernel": conv_kernel(sd["conv2.weight"]), "bias": _np(sd["conv2.bias"])}
    params["conv3"] = {"kernel": conv_kernel(sd["conv3.weight"]), "bias": _np(sd["conv3.bias"])}
    params["fc1"] = {
        "kernel": dense_kernel_chw(sd["fc1.weight"], 64, 3, 3),
        "bias": _np(sd["fc1.bias"]),
    }
    params["fc2"] = {"kernel": dense_kernel(sd["fc2.weight"]), "bias": _np(sd["fc2.bias"])}
    params["fc_accuracy"] = {
        "kernel": dense_kernel(sd["fc_accuracy.weight"]),
        "bias": _np(sd["fc_accuracy.bias"]),
    }
    return params, stats


def convert_alexnet_places(sd: Dict):
    """Convert torchvision-style AlexNet naming (features.{0,3,6,8,10},
    classifier.{1,4,6}) as used by the places365 release the reference
    downloads (/root/reference/dataset/extract_frames.py:56-69)."""
    conv_map = {"conv1": "features.0", "conv2": "features.3", "conv3": "features.6",
                "conv4": "features.8", "conv5": "features.10"}
    params: Dict = {}
    for ours, theirs in conv_map.items():
        params[ours] = {
            "kernel": conv_kernel(sd[f"{theirs}.weight"]),
            "bias": _np(sd[f"{theirs}.bias"]),
        }
    params["fc6"] = {
        "kernel": dense_kernel_chw(sd["classifier.1.weight"], 256, 6, 6),
        "bias": _np(sd["classifier.1.bias"]),
    }
    params["fc7"] = {
        "kernel": dense_kernel(sd["classifier.4.weight"]),
        "bias": _np(sd["classifier.4.bias"]),
    }
    params["fc8"] = {
        "kernel": dense_kernel(sd["classifier.6.weight"]),
        "bias": _np(sd["classifier.6.bias"]),
    }
    return params, {}


def load_torch_state_dict(path: str) -> Dict:
    """Read a torch checkpoint file; unwraps the reference's
    {'model_state_dict': ...} snapshot format when present."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return {k: _np(v) for k, v in blob.items()}
