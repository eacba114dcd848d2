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
                 sampling: str = "epoch"):
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
        # The table is replicated per device, so the per-device limit is the
        # binding one on any mesh. Fail loudly up front: without this an
        # oversized corpus decodes for minutes and then dies in an opaque
        # allocator OOM mid-upload.
        s = batcher.image_size
        frame_bytes = len(uniq) * s * s * 3
        limit = hbm_limit_bytes if hbm_limit_bytes is not None \
            else _device_bytes_limit(mesh)
        if limit is not None and frame_bytes > self.HBM_BUDGET_FRACTION * limit:
            raise ValueError(
                f"TPU.DEVICE_DATASET: the frame table ({len(uniq)} unique "
                f"{s}px frames = {frame_bytes / 1e9:.2f} GB) exceeds "
                f"{self.HBM_BUDGET_FRACTION:.0%} of per-device HBM "
                f"({limit / 1e9:.2f} GB). Use the streaming infeed "
                f"(TPU.DEVICE_DATASET: false, optionally TPU.DECODE_WORKERS/"
                f"TPU.DECODE_CACHE_MB) or a smaller TPU.IMAGE_SIZE."
            )

        # ---- decode once (native batched JPEG stage, chunked) -------------
        from video_dqn_tpu.data.qlearning import load_images
        frames = np.empty((len(paths), s, s, 3), np.uint8)
        for i in range(0, len(paths), decode_chunk):
            chunk = paths[i : i + decode_chunk]
            frames[i : i + len(chunk)] = load_images(chunk, s)
        self.hbm_bytes = frames.nbytes

        # ---- one-time upload ----------------------------------------------
        put = (lambda x: jax.device_put(x, replicated(mesh))) if mesh is not None \
            else jax.device_put
        # The tables are passed to the jitted sampler as ARGUMENTS, never
        # captured in its closure: jit embeds closed-over device arrays
        # into the lowered program as literal constants, so a closure
        # formulation ships the whole multi-GB frame table inside the
        # compile request (observed wedging the axon tunnel's compile RPC
        # for 50+ min with the 2.89 GB published-scale table; JAX warns
        # "A large amount of constants were captured during lowering").
        # As arguments they are program parameters: zero bytes at compile,
        # zero bytes per call.
        self._tables = {
            "frames": put(frames),
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
            before = jnp.take(tables["frames"],
                              jnp.take(tables["before_idx"], rows, axis=0),
                              axis=0)
            after = jnp.take(tables["frames"],
                             jnp.take(tables["after_idx"], rows, axis=0),
                             axis=0)
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
