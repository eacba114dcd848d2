"""Batched, jittable image preprocessing.

Capability parity with the reference's host-side per-image pipeline
(`imageNetTransformPIL`: resize smallest edge -> center crop -> /255 ->
ImageNet normalize, /root/reference/util/torch.py:5-21, and the device-side
`to_imgnet`, /root/reference/util/torch.py:28-43).

TPU-first: the whole transform is ONE fused XLA program over a uint8 NHWC
batch — resize (bilinear, antialiased, matching PIL's downscale filter
within quantization tolerance), crop, scale, and normalize all fuse into
the first conv's HBM read instead of 8 DataLoader workers doing PIL calls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def resize_smallest_edge(batch: jax.Array, size: int) -> jax.Array:
    """Resize NHWC batch so the smallest spatial edge == size (aspect kept).

    Shapes are static under jit: output dims are computed from the input's
    static shape, exactly like torchvision Resize(size) on a fixed-res clip.
    """
    _, h, w, _ = batch.shape
    if h <= w:
        nh, nw = size, max(size, int(round(size * w / h)))
    else:
        nh, nw = max(size, int(round(size * h / w))), size
    return jax.image.resize(
        batch.astype(jnp.float32),
        (batch.shape[0], nh, nw, batch.shape[3]),
        method="bilinear",
        antialias=True,
    )


def center_crop(batch: jax.Array, size: int) -> jax.Array:
    _, h, w, _ = batch.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return batch[:, top : top + size, left : left + size, :]


def normalize_imagenet(batch: jax.Array) -> jax.Array:
    """float [0,1] NHWC -> ImageNet-normalized."""
    return (batch - IMAGENET_MEAN) / IMAGENET_STD


@partial(jax.jit, static_argnums=(1,))
def imagenet_preprocess(batch_uint8: jax.Array, size: int = 224) -> jax.Array:
    """uint8 NHWC batch -> normalized float32 (B, size, size, 3)."""
    x = resize_smallest_edge(batch_uint8, size) / 255.0
    x = center_crop(x, size)
    return normalize_imagenet(x)


@jax.jit
def to_imgnet(batch_uint8: jax.Array) -> jax.Array:
    """uint8 NHWC (already at target resolution) -> normalized float32.
    Device-side equivalent of util.torch.to_imgnet."""
    return normalize_imagenet(batch_uint8.astype(jnp.float32) / 255.0)
