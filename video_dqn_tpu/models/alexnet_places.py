"""AlexNet-Places365 indoor/outdoor scene classifier.

Capability parity with the Places365 AlexNet the reference downloads for
frame filtering (/root/reference/dataset/extract_frames.py:49-89,159-168):
standard torchvision AlexNet topology with num_classes=365. The filter
logic (top-10 class -> indoor probability via the IO map) lives in
data/filters.py; this module is just the backbone, NHWC + bf16.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class AlexNetPlaces365(nn.Module):
    num_classes: int = 365
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rng=None):
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        x = x.astype(self.dtype)
        x = nn.relu(conv(64, 11, 4, 2, "conv1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(192, 5, 1, 2, "conv2")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(384, 3, 1, 1, "conv3")(x))
        x = nn.relu(conv(256, 3, 1, 1, "conv4")(x))
        x = nn.relu(conv(256, 3, 1, 1, "conv5")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        # torch flattens NCHW; converter reorders the fc6 kernel to match.
        x = x.reshape((x.shape[0], -1))  # (B, 6*6*256)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                             name="fc7")(x))
        x = nn.Dense(self.num_classes, dtype=jnp.float32,
                     param_dtype=jnp.float32, name="fc8")(x)
        return x
