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


def _kernel(x_ref, mh_ref, mw_ref, norm_ref, out_ref):
    import jax.numpy as jnp

    x = x_ref[0].astype(jnp.float32)          # (H, W, 3)
    mh = mh_ref[...]                           # (OUT, H)
    mw = mw_ref[...]                           # (OUT, W)
    h, w, c = x.shape
    # rows: (OUT, H) @ (H, W*3)
    y = jnp.dot(mh, x.reshape(h, w * c), preferred_element_type=jnp.float32)
    out = y.shape[0]
    # cols: contract W of (OUT, W, 3) with (OUT_W, W)
    y = y.reshape(out, w, c)
    z = jax.lax.dot_general(
        y, mw, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (OUT, 3, OUT_W)
    # per-channel normalize with SMEM scalars (Pallas kernels cannot
    # capture trace-time constant arrays), stacking back to HWC
    chans = [
        (z[:, ch, :] - norm_ref[0, ch]) * norm_ref[1, ch] for ch in range(c)
    ]
    out_ref[0] = jnp.stack(chans, axis=-1)


@partial(jax.jit, static_argnums=(1, 2))
def resize_normalize_pallas(batch_uint8: jax.Array, out_size: int,
                            interpret: bool = False) -> jax.Array:
    """Pallas path: one kernel invocation per image over the batch grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = batch_uint8.shape
    mh = jnp.asarray(resize_matrix(h, out_size))
    mw = jnp.asarray(resize_matrix(w, out_size))
    mean, inv_std = _norm_consts()
    norm = jnp.stack([mean, inv_std])  # (2, 3)

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_size, out_size, c), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, out_size, out_size, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(batch_uint8, mh, mw, norm)


def fused_preprocess(batch_uint8: jax.Array, out_size: int = 224) -> jax.Array:
    """Backend dispatch: Pallas on TPU, identical XLA einsum elsewhere."""
    if jax.default_backend() == "tpu":
        return resize_normalize_pallas(batch_uint8, out_size)
    return resize_normalize_xla(batch_uint8, out_size)
