"""ROIAlign as pure gather/interpolation XLA (replaces the CUDA op the
reference's detectron2 dependency provides — SURVEY.md "Native
components" item 2).

torchvision semantics with aligned=False and sampling_ratio=2: the ROI is
divided into out_h x out_w bins; each bin is sampled at a 2x2 grid of
bilinear taps which are averaged. Static shapes: vmapped over a fixed
number of (padded) ROIs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(feat: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """feat (H, W, C); y, x: sample coordinates (...,). Returns (..., C).
    Out-of-range taps clamp (matching the CUDA op's boundary handling
    after its <-1/>size guard for in-image ROIs)."""
    h, w = feat.shape[0], feat.shape[1]
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    wy1 = y - y0
    wx1 = x - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def tap(yy, xx):
        return feat[yy.astype(jnp.int32), xx.astype(jnp.int32)]

    return (
        tap(y0, x0) * (wy0 * wx0)[..., None]
        + tap(y0, x1) * (wy0 * wx1)[..., None]
        + tap(y1, x0) * (wy1 * wx0)[..., None]
        + tap(y1, x1) * (wy1 * wx1)[..., None]
    )


@partial(jax.jit, static_argnums=(2, 3, 4))
def roi_align(
    feat: jax.Array,       # (H, W, C) one FPN level
    rois: jax.Array,       # (R, 4) boxes in IMAGE pixels
    spatial_scale: float,  # 1/stride of this level
    out_size: int = 7,
    sampling_ratio: int = 2,
) -> jax.Array:
    """(R, out_size, out_size, C)."""

    def one(box):
        x1, y1, x2, y2 = box * spatial_scale
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        bin_h = rh / out_size
        bin_w = rw / out_size
        iy = jnp.arange(out_size)
        s = jnp.arange(sampling_ratio)
        # tap coordinates: bin origin + (s + .5)/ratio * bin
        ys = y1 + (iy[:, None] + (s[None, :] + 0.5) / sampling_ratio) * bin_h
        xs = x1 + (iy[:, None] + (s[None, :] + 0.5) / sampling_ratio) * bin_w
        # all tap pairs: (out, ratio) x (out, ratio)
        yy = ys.reshape(-1)[:, None]  # (out*ratio, 1)
        xx = xs.reshape(-1)[None, :]  # (1, out*ratio)
        vals = _bilinear(feat, jnp.broadcast_to(yy, (out_size * sampling_ratio,) * 2),
                         jnp.broadcast_to(xx, (out_size * sampling_ratio,) * 2))
        vals = vals.reshape(out_size, sampling_ratio, out_size, sampling_ratio, -1)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one)(rois)


@partial(jax.jit, static_argnums=(2, 3, 4))
def multilevel_roi_align(feats, rois, strides, out_size: int = 7,
                         sampling_ratio: int = 2,
                         canonical_level: int = 2, canonical_size: float = 224.0):
    """FPN level assignment (FPN paper eq. 1, as in torchvision):
    level = floor(canonical + log2(sqrt(area)/canonical_size)), clamped to
    the available levels; each ROI is pooled from its assigned level.

    feats: tuple of (H_l, W_l, C) arrays; strides: matching tuple."""
    num_levels = len(feats)
    areas = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    target = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(jnp.maximum(areas, 1e-6)) / canonical_size + 1e-9)
    )
    # levels are indexed 0..num_levels-1 corresponding to P2..P5
    level = jnp.clip(target, 0, num_levels - 1).astype(jnp.int32)
    pooled = [
        roi_align(f, rois, 1.0 / s, out_size, sampling_ratio)
        for f, s in zip(feats, strides)
    ]
    stacked = jnp.stack(pooled)  # (L, R, out, out, C)
    return jnp.take_along_axis(
        stacked, level[None, :, None, None, None], axis=0
    )[0]
