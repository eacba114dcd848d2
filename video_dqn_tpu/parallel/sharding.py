"""Parameter partition rules for the Q-network family.

Maps parameter pytree paths to PartitionSpecs over the ('data','model')
mesh. The backbone (ResNet18, ~11M params) is replicated — it fits per
chip and its convs don't benefit from TP at this size — while the wide
Q-head matmuls (1600*F x 512, 512 x 256, 256 x A*C) shard their output
features over 'model', with inputs gathered implicitly by XLA.

The reference has no equivalent (single-GPU; SURVEY.md section 2).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    # Dense layers in the Q-head shard their OUTPUT features over 'model';
    # only dims that are multiples of 128 (lane width) are sharded so any
    # mesh up to 128-way TP divides evenly and tiles stay MXU-aligned —
    # the final A*C(=15)-wide layer and all biases below 128 replicate.
    if "top" in joined and leaf.ndim == 2 and leaf.shape[1] % 128 == 0:
        return P(None, MODEL_AXIS)
    if "top" in joined and leaf.ndim == 1 and leaf.shape[0] % 128 == 0:
        return P(MODEL_AXIS)
    return P()


def param_specs(params: Any):
    """Pytree of PartitionSpecs matching `params`."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def param_shardings(mesh: Mesh, params: Any):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Any):
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
