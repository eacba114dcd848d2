"""Binary morphology (disk(1) structuring element) as jitted reduce-windows.

Capability parity with the skimage binary_erosion/binary_dilation calls in
the reference mapper (/root/reference/evaluation/slam.py:336-342,366-368
with selem = skimage.morphology.disk(1), i.e. the 3x3 cross/plus).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# disk(1) = 3x3 plus-shaped structuring element
_DISK1 = jnp.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], jnp.float32)


@jax.jit
def binary_dilation_disk1(mask: jax.Array) -> jax.Array:
    """True wherever the plus-neighborhood contains a True."""
    m = mask.astype(jnp.float32)
    # dilation with the plus element = max over the 5 cells: center, N/S/E/W
    shifted = jnp.stack(
        [
            m,
            jnp.pad(m, ((1, 0), (0, 0)))[:-1, :],   # from north
            jnp.pad(m, ((0, 1), (0, 0)))[1:, :],    # from south
            jnp.pad(m, ((0, 0), (1, 0)))[:, :-1],   # from west
            jnp.pad(m, ((0, 0), (0, 1)))[:, 1:],    # from east
        ]
    )
    return jnp.max(shifted, axis=0) > 0


@jax.jit
def binary_erosion_disk1(mask: jax.Array) -> jax.Array:
    """True only where the whole plus-neighborhood is True. Out-of-border
    neighbors count as False (skimage pads with False for erosion of the
    plus element's reach)."""
    m = mask.astype(jnp.float32)
    shifted = jnp.stack(
        [
            m,
            jnp.pad(m, ((1, 0), (0, 0)))[:-1, :],
            jnp.pad(m, ((0, 1), (0, 0)))[1:, :],
            jnp.pad(m, ((0, 0), (1, 0)))[:, :-1],
            jnp.pad(m, ((0, 0), (0, 1)))[:, 1:],
        ]
    )
    return jnp.min(shifted, axis=0) > 0


@partial(jax.jit, static_argnums=(1,))
def open_n(mask: jax.Array, n: int) -> jax.Array:
    """n erosions then n dilations — the mapper's close_small_openings
    loop body (reference evaluation/slam.py:333-342)."""
    m = mask
    for _ in range(n):
        m = binary_erosion_disk1(m)
    for _ in range(n):
        m = binary_dilation_disk1(m)
    return m


# ---- numpy twins (host path) -------------------------------------------
# The eval planner runs these on 1.4M-cell grids every agent step; going
# through the JAX device layer cost ~90 ms per call in dispatch + copies
# (the dominant term of a worst-case eval episode). The shift arithmetic
# is identical to the jitted versions above, which remain the oracle.

import numpy as np


def binary_dilation_disk1_np(mask: np.ndarray) -> np.ndarray:
    m = np.asarray(mask, bool)
    out = m.copy()
    out[1:, :] |= m[:-1, :]
    out[:-1, :] |= m[1:, :]
    out[:, 1:] |= m[:, :-1]
    out[:, :-1] |= m[:, 1:]
    return out


def binary_erosion_disk1_np(mask: np.ndarray) -> np.ndarray:
    m = np.asarray(mask, bool)
    out = m.copy()
    out[1:, :] &= m[:-1, :]
    out[0, :] = False
    out[:-1, :] &= m[1:, :]
    out[-1, :] = False
    out[:, 1:] &= m[:, :-1]
    out[:, 0] = False
    out[:, :-1] &= m[:, 1:]
    out[:, -1] = False
    return out


def open_n_np(mask: np.ndarray, n: int) -> np.ndarray:
    m = np.asarray(mask, bool)
    for _ in range(n):
        m = binary_erosion_disk1_np(m)
    for _ in range(n):
        m = binary_dilation_disk1_np(m)
    return m
