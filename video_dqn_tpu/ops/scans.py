"""Whole-video reward labeling as parallel scans.

Semantics parity with the reference's O(N^2) Python loops
(/root/reference/dataset/process_episodes_real.py:31-67):

  * steps_to_reward(r)[i]   = distance to the nearest rewarded index >= i
                              (inclusive), +inf if none ahead.
  * steps_to_reward_neg(r)[i] = SIGNED offset to the nearest rewarded index
                              in either direction; ties (equidistant before
                              and after) resolve to the EARLIER index, i.e.
                              the negative offset — matching util.argmin's
                              first-minimum tie-break in the reference.
                              All +inf when the video has no reward.

TPU-first: both are O(N) prefix/suffix cumulative minima, jitted and
vmappable over the class axis — replacing the quadratic host loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.inf


@jax.jit
def steps_to_reward(rewards: jax.Array) -> jax.Array:
    """rewards: (N,) bool/int -> (N,) float32 distances (inf when none)."""
    n = rewards.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    hit = jnp.where(rewards.astype(bool), idx, INF)
    # suffix min of rewarded indices: nearest hit at-or-after i
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(hit)))
    return nxt - idx


@jax.jit
def steps_to_reward_negative(rewards: jax.Array) -> jax.Array:
    """Signed nearest-hit offsets with earlier-index tie-break."""
    n = rewards.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    hit_fwd = jnp.where(rewards.astype(bool), idx, INF)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(hit_fwd)))  # nearest >= i
    hit_bwd = jnp.where(rewards.astype(bool), idx, -INF)
    prv = jax.lax.cummax(hit_bwd)  # nearest <= i
    d_fwd = nxt - idx          # >= 0, inf if none ahead
    d_bwd = prv - idx          # <= 0, -inf if none behind
    # pick smaller |distance|; tie -> earlier index (the backward one)
    take_bwd = jnp.abs(d_bwd) <= jnp.abs(d_fwd)
    out = jnp.where(take_bwd, d_bwd, d_fwd)
    # no reward anywhere -> +inf (reference returns +inf array)
    any_hit = jnp.any(rewards.astype(bool))
    return jnp.where(any_hit, out, INF)


steps_to_reward_multiclass = jax.jit(jax.vmap(steps_to_reward, in_axes=1, out_axes=1))
steps_to_reward_negative_multiclass = jax.jit(
    jax.vmap(steps_to_reward_negative, in_axes=1, out_axes=1)
)


def label_video_host(rewards):
    """Both scans for one video's (N, C) reward matrix, pinned to the host
    CPU backend: dataset assembly calls this for thousands of short
    videos, where accelerator dispatch (and the axon tunnel's remote
    compile) costs far more than the O(N) scan itself. Returns
    (steps_to_reward, steps_to_reward_neg) as numpy arrays."""
    import numpy as np

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        r = jnp.asarray(np.asarray(rewards), jnp.int32)
        fwd = steps_to_reward_multiclass(r)
        neg = steps_to_reward_negative_multiclass(r)
    return np.asarray(fwd), np.asarray(neg)


@jax.jit
def discounted_value_targets(steps: jax.Array, gamma: float = 0.99) -> jax.Array:
    """gamma^steps with NaN where steps are inf — the VALUE_LEARNING ground
    truth of the reference dataloader (q_learning_real.py:86-89)."""
    v = jnp.power(gamma, steps)
    return jnp.where(jnp.isinf(steps), jnp.nan, v)
