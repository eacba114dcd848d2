"""Multi-host (DCN-spanning) runtime helpers.

The reference is strictly single-process (SURVEY.md section 2
communication inventory: no NCCL/MPI/distributed anywhere). Here
multi-host runs are first-class: `initialize()` wires
jax.distributed for a multi-host TPU slice (ICI within a slice, DCN
across), and the `primary_only` helpers gate host-side side effects
(checkpoint writes, metrics, result shards) to process 0 while every
process participates in the global mesh.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection when args are
    omitted. Safe to call on single-process runs (no-op on failure to
    detect a cluster)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # Single-process fallback must be LOUD: a misconfigured real
        # multi-host run degrading silently would train on 1/N of the
        # fleet with no signal (round-1 advisor finding).
        import logging

        logging.getLogger(__name__).warning(
            "jax.distributed.initialize failed (%s: %s) — continuing "
            "single-process. If this is a multi-host run, fix the "
            "coordinator/process settings.", type(e).__name__, e,
        )


def force_virtual_cpu(local_devices: int = 4) -> None:
    """Force THIS process onto the virtual-CPU platform with gloo
    cross-process collectives (for multi-process runs without real
    accelerators — tests, CI). Must run before the first jax backend init:
    XLA_FLAGS parses once, and this container's sitecustomize exports
    JAX_PLATFORMS=axon which must be overridden in BOTH env and config
    (multihost_smoke.py rationale)."""
    import os

    import jax

    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=86400"
    ).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def place_tree(tree, shardings):
    """Place a host pytree on the mesh per `shardings` (a matching pytree
    of NamedShardings). Single-process: plain device_put. Multi-process:
    jax.device_put cannot target non-addressable devices, so each leaf is
    assembled with make_array_from_callback — every process materializes
    the SAME host value (deterministic init / checkpoint read), and the
    callback serves each local device its shard of it."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, sh):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def device_get_local(tree):
    """jax.device_get that also works on global (multi-process) arrays,
    PROVIDED this process's addressable shards cover every element —
    true for replicated state and for TP-sharded params whose model axis
    lies within the process (the trainer's layouts). Raises loudly
    otherwise: checkpointing from partial data would silently corrupt.

    Not a collective — safe under primary_only gating (a
    process_allgather there would deadlock the non-primary processes)."""
    import jax
    import numpy as np

    def get(x):
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            return np.asarray(jax.device_get(x))
        out = np.empty(x.shape, x.dtype)
        covered = set()
        for s in x.addressable_shards:
            out[s.index] = np.asarray(s.data)
            covered.add(tuple(
                (0 if sl.start is None else int(sl.start),
                 dim if sl.stop is None else int(sl.stop))
                for sl, dim in zip(s.index, x.shape)))
        n_covered = sum(
            int(np.prod([hi - lo for lo, hi in region], initial=1))
            for region in covered)
        if n_covered != x.size:
            raise ValueError(
                f"array of shape {x.shape} is not reconstructible from "
                f"this process's shards ({n_covered}/{x.size} elements "
                "local) — a sharding layout split across processes cannot "
                "be checkpointed with device_get_local; gather it "
                "collectively instead")
        return out

    return jax.tree_util.tree_map(get, tree)


def primary_only(fn: Callable) -> Callable:
    """Run fn only on process 0 (checkpointing/logging side effects)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None

    return wrapper


def make_global_array(sharding, global_shape, local_data, start: int):
    """Assemble a globally-sharded jax.Array from THIS process's slice of
    the batch (rows [start, start+len(local_data)) of the global array).

    Built on jax.make_array_from_callback so it stays correct when shards
    are replicated along the model axis (jax 0.9's
    make_array_from_process_local_data double-counts replicated shards as
    distinct addressed elements and rejects the per-process slice). The
    callback asserts every requested shard lies inside this process's
    slice — feeding the wrong slice fails loudly instead of training on
    misaligned data."""
    import jax
    import numpy as np

    local = np.asarray(local_data)
    stop = start + local.shape[0]

    def cb(index):
        s0 = index[0]
        lo = 0 if s0.start is None else s0.start
        hi = global_shape[0] if s0.stop is None else s0.stop
        assert start <= lo and hi <= stop, (
            f"shard rows [{lo}, {hi}) outside this process's slice "
            f"[{start}, {stop}) — global_batch_slice and the mesh layout "
            f"disagree"
        )
        return local[(slice(lo - start, hi - start),) + tuple(index[1:])]

    return jax.make_array_from_callback(tuple(global_shape), sharding, cb)


def global_batch_slice(global_batch_size: int):
    """(start, size) of this process's shard of a globally-sharded batch:
    each host feeds its slice; jax.make_array_from_process_local_data or
    device_put with the global sharding assembles the global array."""
    import jax

    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"batch {global_batch_size} not divisible by {n} hosts")
    per = global_batch_size // n
    return jax.process_index() * per, per
