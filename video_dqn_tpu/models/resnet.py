"""ResNet-18 backbone in Flax (NHWC, MXU-friendly).

TPU-native re-design of the torchvision `resnet18` the reference builds on
(/root/reference/archs/HabitatDQNMultiAction.py:12,30-34 and
/root/reference/archs/inverse_action2.py:50-57): NHWC layout, bfloat16
compute with float32 params/batch-stats, explicit torch-compatible padding
so converted pretrained weights are bit-comparable, and a single batched
pass over all panorama frames instead of a Python loop.

Feature taps:
  - 'conv': through layer4 -> (B, 7, 7, 512)   [torch children()[:-2]]
  - 'pool': + global average pool -> (B, 512)   [torch children()[:-1]]
  - 'logits': + fc -> (B, num_classes)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

Dtype = Any


class Stem7x7(nn.Module):
    """The 7x7-stride-2 stem conv with the canonical torch parameter
    layout and a selectable space-to-depth compute path.

    A direct 7x7 conv over a 3-channel image occupies 3 of the MXU's 128
    input lanes — the train-step attribution (BASELINE.md "MFU
    attribution") pinned the backbone's missing utilization partly here.
    The MLPerf-ResNet rewrite (s2d=True): space-to-depth the input by 2
    (H, W, C) -> (H/2, W/2, 4C) and convolve with the exactly-rearranged
    kernel at stride 1 — output index i reads input rows 2i-3..2i+3,
    i.e. s2d rows i-2..i+1, so a 4x4 kernel whose tap (r, u) carries
    original tap dy = 2r + u - 1 (dy = -1 zero-padded) reproduces the
    7-tap stencil bit-for-bit; padding (2, 1) in s2d space matches the
    original (3, 3).

    MEASURED SLOWER here, so s2d defaults to False: on v5e the rewrite
    cost 21% on the inference forward (20.2 -> 24.4 ms at batch 512) and
    3% on the full train step — this XLA version's native lowering of the
    7x7-s2 stem beats the manual rewrite, and the nominal stem FLOPs rise
    1.3x (4x4 taps cover the 7-tap stencil with zero padding). Kept as a
    selectable path with a bit-exactness test (test_models.py) because
    the trade-off is hardware/compiler-version dependent.

    The parameter stays the canonical (7, 7, C, features) 'kernel' —
    checkpoints, the torchvision converter (torch_convert.py), and golden
    parity tests are unaffected; the rearrangement is done per call (a
    9K-element pad+reshape, free next to the conv). Odd spatial sizes fall
    back to the direct conv."""

    features: int = 64
    dtype: Dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, c_in, self.features), jnp.float32,
        )
        b, h, w, _ = x.shape
        if not self.s2d or h % 2 or w % 2:
            return lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # dy,dx = -1
        k2 = (kp.reshape(4, 2, 4, 2, c_in, self.features)
              .transpose(0, 2, 1, 3, 4, 5)
              .reshape(4, 4, 4 * c_in, self.features))
        x2 = (x.reshape(b, h // 2, 2, w // 2, 2, c_in)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(b, h // 2, w // 2, 4 * c_in))
        return lax.conv_general_dilated(
            x2.astype(self.dtype), k2.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity (or 1x1-projected) skip."""

    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        conv = partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        residual = x
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = conv(self.filters, (1, 1),
                            strides=(self.stride, self.stride),
                            padding="VALID", name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck (torchvision semantics: stride on
    the 3x3). Used by the ResNet-50 detector backbone."""

    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        out_ch = self.filters * 4
        residual = x
        y = conv(self.filters, (1, 1), padding="VALID", name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(out_ch, (1, 1), padding="VALID", name="conv3")(y)
        y = norm(name="bn3")(y)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = conv(out_ch, (1, 1),
                            strides=(self.stride, self.stride),
                            padding="VALID", name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Stages(nn.Module):
    """ResNet-50 returning the C2..C5 stage outputs (strides 4/8/16/32) —
    the FPN taps of the detector backbone. Bottleneck stages (3, 4, 6, 3)
    at widths (64, 128, 256, 512)."""

    dtype: Dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = Stem7x7(64, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        taps = []
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(width, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{block}")(x, train=train)
            taps.append(x)
        return tuple(taps)  # C2, C3, C4, C5


class ResNet18(nn.Module):
    """Stages of (2,2,2,2) BasicBlocks at (64,128,256,512) filters."""

    features: str = "pool"  # 'conv' | 'pool' | 'logits'
    num_classes: int = 1000
    dtype: Dtype = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = Stem7x7(64, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(width, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{block}")(x, train=train)
        if self.features == "conv":
            return x
        x = jnp.mean(x, axis=(1, 2))
        if self.features == "pool":
            return x
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        return x
