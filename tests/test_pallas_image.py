"""Fused preprocessing kernel tests: the Pallas kernel (interpret mode on
CPU) must match its XLA einsum twin exactly, and both must track
jax.image.resize + normalize."""

import numpy as np

import jax.numpy as jnp

from video_dqn_tpu.ops.image import imagenet_preprocess, normalize_imagenet
from video_dqn_tpu.ops.pallas_image import (
    resize_matrix,
    resize_normalize_pallas,
    resize_normalize_xla,
)


def test_resize_matrix_rows_sum_to_one():
    for src, dst in [(256, 224), (100, 224), (480, 224)]:
        m = resize_matrix(src, dst)
        assert m.shape == (dst, src)
        np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-5)


def test_xla_twin_matches_jax_image_resize(rng):
    raw = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    got = np.asarray(resize_normalize_xla(jnp.asarray(raw), 32))
    import jax

    want = jax.image.resize(
        raw.astype(np.float32), (2, 32, 32, 3), "bilinear", antialias=True
    )
    want = np.asarray(normalize_imagenet(want / 255.0))
    # interiors agree tightly; borders differ by design (our matrix clamps
    # out-of-range taps PIL-style, jax.image drops and renormalizes)
    np.testing.assert_allclose(got[:, 2:-2, 2:-2], want[:, 2:-2, 2:-2], atol=2e-2)


def test_pallas_kernel_matches_xla_twin(rng):
    raw = rng.integers(0, 256, (2, 48, 40, 3), np.uint8)
    want = np.asarray(resize_normalize_xla(jnp.asarray(raw), 32))
    got = np.asarray(
        resize_normalize_pallas(jnp.asarray(raw), 32, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_identity_resize_is_normalize(rng):
    raw = rng.integers(0, 256, (1, 16, 16, 3), np.uint8)
    got = np.asarray(resize_normalize_xla(jnp.asarray(raw), 16))
    want = np.asarray(normalize_imagenet(raw.astype(np.float32) / 255.0))
    np.testing.assert_allclose(got, want, atol=1e-5)
