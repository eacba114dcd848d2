"""HBM-resident Q-learning dataset: decode every unique frame ONCE, upload
ONCE, then sample training batches entirely ON DEVICE.

Why this exists: the reference streams every batch from host DataLoader
workers every step (/root/reference/train_q_network.py:98 — 8 workers
re-decoding JPEGs per epoch), which on TPU means paying the host->HBM wire
for ~77 MB per batch-256 step forever. Measured here (BASELINE.md host-fed
rows), that wire is the infeed ceiling: neither decode workers nor a
decoded-frame RAM cache move it because the bytes still cross per step.
The published workload's dataset is static and small relative to HBM
(tens of thousands of 224 px frames = a few GB on a 16 GB chip), so the
TPU-native design is a one-time upload + device-side gather:

  frames   (U, S, S, 3) uint8   all unique frames, one HBM buffer
  row maps (N, F) int32         before/after stack -> frame indices
  labels   (N,), (N, 5)         action / reward / terminal / gt / mask

and per step one jitted `sample(step)` that folds the step into the seed,
draws B row indices, and gathers the batch — zero host bytes per step, so
sustained training runs at the device-resident rate (bench.py's headline)
instead of the wire rate.

Sampling semantics (TPU.DEVICE_SAMPLING): 'epoch' (default) draws a
fresh on-device permutation per epoch and slices batch-sized windows
with drop_last — the exact semantics of the reference's shuffle
DataLoader (train_q_network.py:60-67,98) and of this framework's own
host stream (qlearning.QLearningBatcher.batches); the per-step
permutation sort of ~19k int32 is noise next to the step. 'uniform'
draws rows uniformly with replacement (the mode the first published-
scale artifacts ran; statistically equivalent at ~270 epochs). Both are
pure functions of (seed, step), so a resumed run (-r) continues the
exact sample sequence it would have drawn.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_dqn_tpu.parallel import batch_sharding, replicated


def _device_bytes_limit(mesh) -> Optional[int]:
    """Per-device HBM capacity if the runtime exposes it (TPU does via
    memory_stats; the CPU backend returns None)."""
    dev = mesh.devices.flat[0] if mesh is not None else jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit")


class DeviceDataset:
    """Build from a QLearningBatcher (reuses its label/semantics work);
    `sample(step)` returns a device-resident batch dict with the exact
    QLearningBatcher.get_batch contract."""

    # Fraction of per-device HBM the frame table may occupy: the rest is
    # for params + Adam moments + target net + step activations (batch 512
    # at 224 px peaks ~4 GB) and XLA scratch. 2.89 GB/16 GB = 0.18 is the
    # proven published-scale point; 0.6 leaves the step comfortable.
    HBM_BUDGET_FRACTION = 0.6

    def __init__(self, batcher, batch_size: int, mesh=None, seed: int = 0,
                 decode_chunk: int = 512,
                 hbm_limit_bytes: Optional[int] = None,
                 sampling: str = "epoch",
                 shard_frames: bool = False):
        self.batch_size = int(batch_size)
        self.n = len(batcher)
        if self.batch_size > self.n:
            raise ValueError(
                f"batch_size {batch_size} exceeds dataset size {self.n}")

        # ---- unique-frame table + per-row index maps ----------------------
        cols = batcher.cols
        uniq: Dict[str, int] = {}
        stacks = {}
        for col in ("before_image", "after_image"):
            idx = np.empty((self.n, batcher.num_frames), np.int32)
            for i in range(self.n):
                for f, p in enumerate(
                        batcher._stack_paths(cols[col][i],
                                             cols["im_start"][i])):
                    idx[i, f] = uniq.setdefault(p, len(uniq))
            stacks[col] = idx
        paths = [None] * len(uniq)
        for p, j in uniq.items():
            paths[j] = p

        # ---- capacity guard (BEFORE the minutes-long decode) ---------------
        # Replicated mode: the per-device limit binds on any mesh. Sharded
        # mode (TPU.SHARD_DATASET): the table is split along the 'data'
        # axis, so the budget is the AGGREGATE of the data-axis shards —
        # n_data x the corpus capacity. Fail loudly up front: without this
        # an oversized corpus decodes for minutes and then dies in an
        # opaque allocator OOM mid-upload.
        from video_dqn_tpu.parallel.mesh import DATA_AXIS

        n_data = int(mesh.shape[DATA_AXIS]) if mesh is not None else 1
        # a 1-shard data axis degenerates to the replicated layout
        self.sharded = bool(shard_frames and mesh is not None and n_data > 1)
        if self.sharded and self.batch_size % n_data:
            raise ValueError(
                f"TPU.SHARD_DATASET: batch_size {batch_size} must divide "
                f"across the {n_data}-way data axis")
        s = batcher.image_size
        frame_bytes = len(uniq) * s * s * 3
        limit = hbm_limit_bytes if hbm_limit_bytes is not None \
            else _device_bytes_limit(mesh)
        scale = n_data if self.sharded else 1
        if limit is not None and frame_bytes > self.HBM_BUDGET_FRACTION * limit * scale:
            hint = ("Use the streaming infeed (TPU.DEVICE_DATASET: false, "
                    "optionally TPU.DECODE_WORKERS/TPU.DECODE_CACHE_MB) or "
                    "a smaller TPU.IMAGE_SIZE."
                    if self.sharded or n_data == 1 else
                    "Shard the table across the data axis "
                    "(TPU.SHARD_DATASET: true — aggregate capacity "
                    f"{self.HBM_BUDGET_FRACTION * limit * n_data / 1e9:.2f} "
                    "GB), or use the streaming infeed "
                    "(TPU.DEVICE_DATASET: false).")
            raise ValueError(
                f"TPU.DEVICE_DATASET: the frame table ({len(uniq)} unique "
                f"{s}px frames = {frame_bytes / 1e9:.2f} GB) exceeds "
                f"{self.HBM_BUDGET_FRACTION:.0%} of "
                f"{'aggregate data-axis' if self.sharded else 'per-device'} "
                f"HBM ({limit * scale / 1e9:.2f} GB). " + hint
            )

        # ---- decode once (native batched JPEG stage, chunked) -------------
        from video_dqn_tpu.data.qlearning import load_images
        # sharded layout pads the table to a multiple of the shard count
        # (zero rows are never indexed — row maps only reference [0, U))
        pad = (-len(paths)) % n_data if self.sharded else 0
        frames = np.zeros((len(paths) + pad, s, s, 3), np.uint8)
        for i in range(0, len(paths), decode_chunk):
            chunk = paths[i : i + decode_chunk]
            frames[i : i + len(chunk)] = load_images(chunk, s)
        self.hbm_bytes = frames.nbytes
        self.frame_rows = frames.shape[0]

        # ---- one-time upload ----------------------------------------------
        # multi-process runs assemble the replicated tables through
        # make_array_from_callback (multihost.place_tree) — every process
        # decodes the same corpus and serves its local devices; plain
        # device_put cannot target the other processes' devices
        if mesh is not None:
            from video_dqn_tpu.parallel import multihost

            rep = replicated(mesh)
            put = lambda x: multihost.place_tree(x, rep)
        else:
            put = jax.device_put
        # The tables are passed to the jitted sampler as ARGUMENTS, never
        # captured in its closure: jit embeds closed-over device arrays
        # into the lowered program as literal constants, so a closure
        # formulation ships the whole multi-GB frame table inside the
        # compile request (observed wedging the axon tunnel's compile RPC
        # for 50+ min with the 2.89 GB published-scale table; JAX warns
        # "A large amount of constants were captured during lowering").
        # As arguments they are program parameters: zero bytes at compile,
        # zero bytes per call.
        if self.sharded:
            from jax.sharding import NamedSharding, PartitionSpec

            from video_dqn_tpu.parallel import multihost

            frames_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            put_frames = lambda x: multihost.place_tree(x, frames_sharding)
        else:
            put_frames = put
        self._tables = {
            "frames": put_frames(frames),
            "before_idx": put(stacks["before_image"]),
            "after_idx": put(stacks["after_image"]),
            "action": put(batcher.action.astype(np.int32)),
            "reward": put(batcher.reward),
            "terminal": put(batcher.terminal),
            "gt": put(batcher.gt),
            "valid_mask": put(batcher.valid_mask),
        }
        self._base_key = put(jax.random.key_data(jax.random.key(seed)))

        n, b = self.n, self.batch_size
        if sampling not in ("epoch", "uniform"):
            raise ValueError(
                f"TPU.DEVICE_SAMPLING must be 'epoch' or 'uniform', "
                f"got {sampling!r}")
        self.sampling = sampling
        # epoch mode: shuffle-without-replacement + drop_last, the exact
        # semantics of QLearningBatcher.batches and the reference's
        # shuffle DataLoader (train_q_network.py:60-67,98)
        steps_per_epoch = n // b

        if self.sharded:
            # TPU.SHARD_DATASET gather: the frame table lives split along
            # the 'data' axis (1/n_data per device — aggregate-HBM corpora),
            # while the batch's frame indices are an arbitrary function of
            # the draw. XLA's SPMD partitioner would resolve a plain gather
            # from a sharded operand by all-gathering the whole TABLE per
            # step; instead shard_map expresses the minimal collective:
            # each device gathers the requested rows IT owns (clipped local
            # take + ownership mask), and one psum_scatter over 'data' both
            # sums the per-shard contributions and deals each device its
            # own batch slice — wire per step = one batch of frames, not
            # the table, and the result lands already batch-sharded (the
            # layout the train step's with_sharding_constraint wants).
            # The draw itself is unchanged, so the sample stream is
            # BIT-IDENTICAL to the replicated layout (pinned by
            # tests/test_device_dataset.py::test_sharded_table_matches_replicated).
            from jax.sharding import PartitionSpec as P

            shard_rows = self.frame_rows // n_data

            def gather_frames(frames, idx):
                def body(frames_shard, idx_rep):
                    off = jax.lax.axis_index(DATA_AXIS) * shard_rows
                    local = jnp.take(
                        frames_shard,
                        jnp.clip(idx_rep - off, 0, shard_rows - 1), axis=0)
                    owned = (idx_rep >= off) & (idx_rep < off + shard_rows)
                    contrib = jnp.where(
                        owned[..., None, None, None], local, 0)
                    return jax.lax.psum_scatter(
                        contrib, DATA_AXIS, scatter_dimension=0, tiled=True)

                return jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P(DATA_AXIS), P()),
                    out_specs=P(DATA_AXIS))(frames, idx)
        else:
            def gather_frames(frames, idx):
                return jnp.take(frames, idx, axis=0)

        def sample(tables, base_key, step: jax.Array):
            if sampling == "epoch":
                epoch = step // steps_per_epoch
                j = step % steps_per_epoch
                perm = jax.random.permutation(
                    jax.random.fold_in(
                        jax.random.wrap_key_data(base_key), epoch), n)
                rows = jax.lax.dynamic_slice(perm, (j * b,), (b,))
            else:
                key = jax.random.fold_in(
                    jax.random.wrap_key_data(base_key), step)
                rows = jax.random.randint(key, (b,), 0, n)
            before = gather_frames(
                tables["frames"], jnp.take(tables["before_idx"], rows, axis=0))
            after = gather_frames(
                tables["frames"], jnp.take(tables["after_idx"], rows, axis=0))
            return {
                "before": before,  # (B, F, S, S, 3) uint8
                "after": after,
                "action": jnp.take(tables["action"], rows, axis=0),
                "reward": jnp.take(tables["reward"], rows, axis=0),
                "terminal": jnp.take(tables["terminal"], rows, axis=0),
                "gt": jnp.take(tables["gt"], rows, axis=0),
                "valid_mask": jnp.take(tables["valid_mask"], rows, axis=0),
            }

        out_shardings = batch_sharding(mesh) if mesh is not None else None
        # the pure sampler body: run_train fuses it INTO the train step
        # (one XLA program, one dispatch per step — each extra dispatch
        # costs ~13 ms through the tunneled runtime, measured as the
        # residual gap between the batch-512 published-scale rate and the
        # synthetic headline). The standalone jitted form remains for the
        # `batches()` stream API and tests.
        self.sample_body = sample
        self.tables = self._tables
        self.base_key = self._base_key
        self._sample = jax.jit(sample, out_shardings=out_shardings)

    def sample(self, step: int):
        return self._sample(self._tables, self._base_key,
                            jnp.asarray(step, jnp.int32))

    def batches(self, start_step: int = 0):
        """Infinite device-resident batch stream; batch k is sample(k) so
        resume reproduces the stream."""
        step = start_step
        while True:
            yield self.sample(step)
            step += 1
