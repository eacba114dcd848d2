import numpy as np
import pytest

import jax.numpy as jnp

from video_dqn_tpu.ops.image import imagenet_preprocess, to_imgnet
from video_dqn_tpu.ops.scans import (
    discounted_value_targets,
    steps_to_reward,
    steps_to_reward_multiclass,
    steps_to_reward_negative,
)


# -- brute-force oracles implementing the documented reference semantics
#    (process_episodes_real.py:31-67) --------------------------------------

def brute_steps(rewards):
    hits = [i for i, r in enumerate(rewards) if r]
    out = []
    for i in range(len(rewards)):
        ahead = [h for h in hits if h >= i]
        out.append(min(ahead) - i if ahead else np.inf)
    return np.array(out, np.float64)


def brute_steps_negative(rewards):
    hits = [i for i, r in enumerate(rewards) if r]
    if not hits:
        return np.full(len(rewards), np.inf)
    out = []
    for i in range(len(rewards)):
        # first minimum of |i - h| over hits in ascending order (= argmin
        # tie-break toward the earlier hit, like the reference's util.argmin)
        best = min(hits, key=lambda h: (abs(i - h), h))
        out.append(best - i)
    return np.array(out, np.float64)


@pytest.mark.parametrize("seed", range(5))
def test_steps_to_reward_matches_bruteforce(seed):
    r = np.random.default_rng(seed).random(50) < 0.15
    np.testing.assert_array_equal(np.asarray(steps_to_reward(jnp.asarray(r))), brute_steps(r))


@pytest.mark.parametrize("seed", range(5))
def test_steps_negative_matches_bruteforce(seed):
    r = np.random.default_rng(seed).random(50) < 0.15
    np.testing.assert_array_equal(
        np.asarray(steps_to_reward_negative(jnp.asarray(r))), brute_steps_negative(r)
    )


def test_steps_no_reward_is_inf():
    r = np.zeros(10, bool)
    assert np.all(np.isinf(np.asarray(steps_to_reward(jnp.asarray(r)))))
    assert np.all(np.asarray(steps_to_reward_negative(jnp.asarray(r))) == np.inf)


def test_steps_tie_break_prefers_earlier():
    # hits at 1 and 5; index 3 is equidistant -> expect -2 (earlier hit)
    r = np.zeros(7, bool)
    r[1] = r[5] = True
    got = np.asarray(steps_to_reward_negative(jnp.asarray(r)))
    assert got[3] == -2


def test_steps_multiclass_vmap():
    r = (np.random.default_rng(0).random((40, 5)) < 0.2)
    got = np.asarray(steps_to_reward_multiclass(jnp.asarray(r)))
    for c in range(5):
        np.testing.assert_array_equal(got[:, c], brute_steps(r[:, c]))


def test_value_targets_nan_on_inf():
    steps = jnp.array([0.0, 2.0, jnp.inf])
    v = np.asarray(discounted_value_targets(steps, 0.9))
    assert v[0] == 1.0
    np.testing.assert_allclose(v[1], 0.81, atol=1e-6)
    assert np.isnan(v[2])


# -- image transform parity vs PIL ----------------------------------------

def test_imagenet_preprocess_matches_pil(rng):
    from PIL import Image

    raw = rng.integers(0, 256, (300, 400, 3), np.uint8)
    # PIL pipeline: resize smallest edge to 224 (bilinear), center crop,
    # scale, normalize — the reference's imageNetTransformPIL.
    im = Image.fromarray(raw)
    w, h = im.size
    if h <= w:
        nh, nw = 224, int(round(224 * w / h))
    else:
        nh, nw = int(round(224 * h / w)), 224
    pil = np.asarray(im.resize((nw, nh), Image.BILINEAR), np.float32) / 255.0
    top, left = (nh - 224) // 2, (nw - 224) // 2
    pil = pil[top : top + 224, left : left + 224]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = (pil - mean) / std

    got = np.asarray(imagenet_preprocess(jnp.asarray(raw[None]), 224))[0]
    assert got.shape == (224, 224, 3)
    # different antialias kernels: compare in pixel units, generous bound
    err = np.abs(got - want) * std  # back to [0,1] pixel scale
    assert err.mean() < 0.02, err.mean()


def test_to_imgnet_exact(rng):
    raw = rng.integers(0, 256, (2, 8, 8, 3), np.uint8)
    got = np.asarray(to_imgnet(jnp.asarray(raw)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = (raw.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_preprocess_upscales_small_images(rng):
    raw = rng.integers(0, 256, (1, 100, 150, 3), np.uint8)
    got = imagenet_preprocess(jnp.asarray(raw), 224)
    assert got.shape == (1, 224, 224, 3)


def test_numpy_morphology_matches_jax(rng):
    """Host-path numpy twins vs the jitted originals (the planner's hot
    loop uses the numpy versions; the JAX versions remain the oracle)."""
    from video_dqn_tpu.ops.morphology import (
        binary_dilation_disk1,
        binary_dilation_disk1_np,
        binary_erosion_disk1,
        binary_erosion_disk1_np,
        open_n,
        open_n_np,
    )

    m = rng.random((64, 57)) > 0.6
    np.testing.assert_array_equal(
        binary_dilation_disk1_np(m), np.asarray(binary_dilation_disk1(m)))
    np.testing.assert_array_equal(
        binary_erosion_disk1_np(m), np.asarray(binary_erosion_disk1(m)))
    for n in (1, 2, 3):
        np.testing.assert_array_equal(
            open_n_np(m, n), np.asarray(open_n(m, n)))
