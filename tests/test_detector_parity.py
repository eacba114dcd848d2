"""Detector component parity vs torch mirrors: ResNet-50 stages, FPN,
RPN head, box head — converted weights, same inputs, same outputs."""

import numpy as np
import torch

import jax.numpy as jnp

from video_dqn_tpu.models.detector.convert import convert_resnet50_stages
from video_dqn_tpu.models.detector.maskrcnn import FPN, BoxHead, RPNHead
from video_dqn_tpu.models.resnet import ResNet50Stages
from video_dqn_tpu.models.torch_convert import (
    conv_kernel,
    dense_kernel,
    dense_kernel_chw,
    _np,
)
from tests.test_models import nchw, randomize
from tests.torch_ref_detector import (
    TorchBoxHead,
    TorchFPN,
    TorchResNet50Stages,
    TorchRPNHead,
)

ATOL = 3e-3


def test_resnet50_stages_parity(rng):
    tm = randomize(TorchResNet50Stages())
    sd = {f"p.{k}": v for k, v in tm.state_dict().items()}
    params, stats = convert_resnet50_stages(sd, "p.")
    x = rng.standard_normal((1, 96, 96, 3), dtype=np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm(nchw(x))]
    got = ResNet50Stages(dtype=jnp.float32).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(g), -1, 1), w, atol=ATOL
        )


def _fpn_params(tm):
    params = {}
    sd = tm.state_dict()
    for i in range(4):
        params[f"inner{i}"] = {
            "kernel": conv_kernel(sd[f"inner_blocks.{i}.weight"]),
            "bias": _np(sd[f"inner_blocks.{i}.bias"]),
        }
        params[f"layer{i}"] = {
            "kernel": conv_kernel(sd[f"layer_blocks.{i}.weight"]),
            "bias": _np(sd[f"layer_blocks.{i}.bias"]),
        }
    return params


def test_fpn_parity(rng):
    tm = randomize(TorchFPN())
    feats_np = [
        rng.standard_normal((1, c, s, s)).astype(np.float32)
        for c, s in zip((256, 512, 1024, 2048), (32, 16, 8, 4))
    ]
    with torch.no_grad():
        want = [t.numpy() for t in tm([torch.tensor(f) for f in feats_np])]
    got = FPN(dtype=jnp.float32).apply(
        {"params": _fpn_params(tm)},
        *[jnp.asarray(np.moveaxis(f, 1, -1)) for f in feats_np],
    )
    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.moveaxis(np.asarray(g), -1, 1), w, atol=1e-4)


def test_rpn_head_parity(rng):
    tm = randomize(TorchRPNHead())
    sd = tm.state_dict()
    params = {
        "conv": {"kernel": conv_kernel(sd["conv.weight"]), "bias": _np(sd["conv.bias"])},
        "cls_logits": {"kernel": conv_kernel(sd["cls_logits.weight"]),
                       "bias": _np(sd["cls_logits.bias"])},
        "bbox_pred": {"kernel": conv_kernel(sd["bbox_pred.weight"]),
                      "bias": _np(sd["bbox_pred.bias"])},
    }
    feats_np = [rng.standard_normal((1, 256, s, s)).astype(np.float32) for s in (16, 8)]
    with torch.no_grad():
        want_l, want_d = tm([torch.tensor(f) for f in feats_np])
    got_l, got_d = RPNHead(dtype=jnp.float32).apply(
        {"params": params},
        [jnp.asarray(np.moveaxis(f, 1, -1)) for f in feats_np],
    )
    for g, w in zip(got_l, want_l):
        np.testing.assert_allclose(np.moveaxis(np.asarray(g), -1, 1), w.numpy(), atol=1e-4)
    for g, w in zip(got_d, want_d):
        np.testing.assert_allclose(np.moveaxis(np.asarray(g), -1, 1), w.numpy(), atol=1e-4)


def test_box_head_parity(rng):
    tm = randomize(TorchBoxHead())
    sd = tm.state_dict()
    params = {
        "fc6": {"kernel": dense_kernel_chw(sd["fc6.weight"], 256, 7, 7),
                "bias": _np(sd["fc6.bias"])},
        "fc7": {"kernel": dense_kernel(sd["fc7.weight"]), "bias": _np(sd["fc7.bias"])},
        "cls_score": {"kernel": dense_kernel(sd["cls_score.weight"]),
                      "bias": _np(sd["cls_score.bias"])},
        "bbox_pred": {"kernel": dense_kernel(sd["bbox_pred.weight"]),
                      "bias": _np(sd["bbox_pred.bias"])},
    }
    pooled = rng.standard_normal((5, 256, 7, 7)).astype(np.float32)
    with torch.no_grad():
        want_s, want_d = tm(torch.tensor(pooled))
    got_s, got_d = BoxHead(dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(np.moveaxis(pooled, 1, -1))
    )
    np.testing.assert_allclose(np.asarray(got_s), want_s.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_d), want_d.numpy(), atol=1e-4)
