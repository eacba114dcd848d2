"""Fused frame preprocessing as a Pallas TPU kernel.

The training/eval hot path feeds uint8 camera/JPEG frames into the
ImageNet transform (resize -> scale -> normalize; reference
util/torch.py:5-21) before the first conv. This module implements that
transform as ONE Pallas kernel per image:

    u8 frame --VMEM--> f32 -> M_h @ X (MXU) -> Y @ M_w^T (MXU) -> normalize

Bilinear (antialiased) resampling is expressed as two small matmuls with
precomputed interpolation matrices — the MXU-native formulation of
resize — so the uint8 load, both resamples, and the normalize run in one
VMEM residency instead of separate XLA ops. A pure-XLA einsum twin
(`resize_normalize_xla`) provides the identical numeric path for CPU and
for correctness tests; `fused_preprocess` picks per backend.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .image import IMAGENET_MEAN, IMAGENET_STD


@lru_cache(maxsize=64)
def resize_matrix(src: int, dst: int, antialias: bool = True) -> np.ndarray:
    """(dst, src) bilinear interpolation weights (triangle kernel, scaled
    for antialiasing on downscale — jax.image.resize/PIL semantics:
    half-pixel centers)."""
    scale = src / dst
    support = max(scale, 1.0) if antialias else 1.0
    out = np.zeros((dst, src), np.float32)
    for d in range(dst):
        center = (d + 0.5) * scale - 0.5
        lo = int(np.floor(center - support))
        hi = int(np.ceil(center + support))
        xs = np.arange(lo, hi + 1)
        w = 1.0 - np.abs(xs - center) / support
        w = np.clip(w, 0.0, None)
        xs = np.clip(xs, 0, src - 1)
        for x, ww in zip(xs, w):
            out[d, x] += ww
        out[d] /= max(out[d].sum(), 1e-8)
    return out


def _norm_consts(dtype=jnp.float32):
    return (
        (IMAGENET_MEAN * 255.0).astype(dtype),
        (1.0 / (IMAGENET_STD * 255.0)).astype(dtype),
    )


@partial(jax.jit, static_argnums=(1,))
def resize_normalize_xla(batch_uint8: jax.Array, out_size: int) -> jax.Array:
    """XLA twin: uint8 (B, H, W, 3) -> normalized f32 (B, out, out, 3)
    via the same two interpolation matmuls."""
    b, h, w, c = batch_uint8.shape
    mh = jnp.asarray(resize_matrix(h, out_size))
    mw = jnp.asarray(resize_matrix(w, out_size))
    x = batch_uint8.astype(jnp.float32)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    z = jnp.einsum("pw,bowc->bopc", mw, y)
    mean, inv_std = _norm_consts()
    return (z - mean) * inv_std


def _kernel(x_ref, mh_ref, mw3_ref, mean_ref, inv_ref, out_ref):
    """Fully 2-D formulation (TPU layouts want >=2-D, lane-major):
    the HWC image is viewed as (H, W*3); the column resample+channel
    mixing is one matmul against kron(Mw, I3)^T; normalization uses
    per-output-column rows. Everything is MXU matmuls + VPU elementwise.
    Mosaic has no direct uint8->f32 cast; hop through int32."""
    import jax.numpy as jnp

    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # (H, W*3)
    y = jnp.dot(mh_ref[...], x, preferred_element_type=jnp.float32)  # (OUT, W*3)
    z = jnp.dot(y, mw3_ref[...], preferred_element_type=jnp.float32)  # (OUT, OUT_W*3)
    out_ref[0] = (z - mean_ref[...]) * inv_ref[...]


@partial(jax.jit, static_argnums=(1, 2))
def resize_normalize_pallas(batch_uint8: jax.Array, out_size: int,
                            interpret: bool = False) -> jax.Array:
    """Pallas path: one kernel invocation per image over the batch grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = batch_uint8.shape
    mh = jnp.asarray(resize_matrix(h, out_size))
    # kron(Mw, I_c)^T: (W*c, OUT*c) — column resample and channel
    # passthrough as one matmul operand
    mw3 = jnp.asarray(
        np.kron(resize_matrix(w, out_size), np.eye(c, dtype=np.float32)).T
    )
    mean, inv_std = _norm_consts()
    mean_row = jnp.tile(mean, out_size)[None, :]      # (1, OUT*c)
    inv_row = jnp.tile(inv_std, out_size)[None, :]

    x2d = batch_uint8.reshape(b, h, w * c)  # layout-free view of HWC
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_size, out_size * c), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w * c, out_size * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_size * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_size * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_size, out_size * c),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, mh, mw3, mean_row, inv_row)
    return out.reshape(b, out_size, out_size, c)


def fused_preprocess(batch_uint8: jax.Array, out_size: int = 224,
                     use_pallas: bool = False) -> jax.Array:
    """Fused resize+normalize. Default is the XLA einsum path: measured on
    TPU v5e (batch 16, 256x342 -> 224) it reaches 20.6k imgs/sec vs the
    Pallas kernel's 11.0k — XLA pipelines HBM across the batch better than
    the one-image-per-grid-step kernel, and both produce identical values
    (max diff 3.6e-7). The kernel remains available (use_pallas=True) as
    the hand-scheduled variant."""
    if use_pallas and jax.default_backend() == "tpu":
        return resize_normalize_pallas(batch_uint8, out_size)
    return resize_normalize_xla(batch_uint8, out_size)
