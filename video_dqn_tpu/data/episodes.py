"""Episode assembly: filtered frames + detections -> Q-learning
quadruplet feather.

Capability parity with /root/reference/dataset/process_episodes_real.py:
  * contiguous valid-frame ranges per video: a frame i (1-based) is valid
    when it passes the indoor/person filter (i in indoor_locs and not in
    person_locs — the reference's membership convention) AND its jpg
    exists (:104-132); ranges shorter than stride+1 are dropped (:138-139)
  * quadruplets (i, i+3) with the AFTER frame's detector scores (:140-141)
  * sparse rewards via the per-class confidence thresholds (:17-20)
  * steps_to_reward / steps_to_reward_neg per class — computed here as
    O(N) scans on the host CPU backend (ops/scans.label_video_host)
    instead of the reference's O(N^2) Python loops (:31-67)
  * inverse-action labeling over (before, after) pairs with a batched
    jitted model call (:164-179; batches of 8 there, larger here)
  * the exact feather schema of data/schema.py (:144-161,179-181)
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np
import pandas as pd

from .schema import DETECTION_THRESHOLDS, multi_add, write_feather
from .detect import score_vals
from video_dqn_tpu.ops.scans import label_video_host


def valid_frame_ranges(
    max_frame: int,
    indoor_locs,
    person_locs,
    frame_exists: Callable[[int], bool],
):
    """Contiguous [start, stop) ranges of valid frames (python-range
    semantics, reference :120-132)."""
    indoor = set(int(x) for x in indoor_locs)
    person = set(int(x) for x in person_locs)

    def valid(i):
        return i in indoor and i not in person and frame_exists(i)

    ranges = []
    started = None
    for i in range(1, max_frame + 2):
        if valid(i) and started is None:
            started = i
        elif started is not None and not valid(i):
            ranges.append((started, i))
            started = None
    if started is not None:
        raise RuntimeError("bad start")
    return ranges


def assemble_episodes(
    detections: Dict[str, Dict[int, np.ndarray]],
    filters_dir: str,
    frames_root: str,
    stride: int = 3,
    inverse_labeler: Optional[Callable] = None,
    inverse_batch: int = 64,
    image_size: int = 224,
) -> pd.DataFrame:
    """Build the quadruplet DataFrame for all videos.

    detections:      {vid: {frame_id: (5, 2) class array}}
    filters_dir:     <vid>_filters.npy files
    inverse_labeler: (before_uint8 (B,H,W,3), after_uint8) -> (B,) actions;
                     omitted -> no inverse_actions column
    """
    frames = []
    for vid, res in detections.items():
        fpath = os.path.join(filters_dir, f"{vid}_filters.npy")
        filt = np.load(fpath, allow_pickle=True)[()]
        im_ids = sorted(res.keys())
        if not im_ids:
            continue

        def filename(i):
            return os.path.join(frames_root, vid, f"{i:04d}.jpg")

        ranges = valid_frame_ranges(
            max(im_ids),
            filt["indoor_locs"],
            filt["person_locs"],
            lambda i: os.path.exists(filename(i)),
        )
        for start, stop in ranges:
            if stop <= start + stride:
                continue
            rows, ds = [], []
            for i in range(start, stop - stride):
                rows.append((filename(i), filename(i + stride), vid, start, stop))
                ds.append(score_vals(res[i + stride]))
            ds = np.stack(ds)
            df = pd.DataFrame(
                rows,
                columns=["before_image", "after_image", "ep_id", "im_start", "im_stop"],
            )
            multi_add(df, ds, "detector_score")
            sparse = (ds > DETECTION_THRESHOLDS).astype(np.int64)
            multi_add(df, sparse, "sparse_reward")
            fwd, neg = label_video_host(sparse)
            multi_add(df, fwd.astype(np.float64), "steps_to_reward")
            multi_add(df, neg.astype(np.float64), "steps_to_reward_neg")
            frames.append(df)

    if not frames:
        return pd.DataFrame()
    all_samples = pd.concat(frames, ignore_index=True)

    if inverse_labeler is not None:
        if getattr(inverse_labeler, "supports_table", False):
            # decode-once/table path: each unique frame is decoded and
            # shipped to the device exactly ONCE (see TableInverseLabeler)
            all_samples["inverse_actions"] = inverse_labeler.label_rows(
                all_samples["before_image"].tolist(),
                all_samples["after_image"].tolist(),
                image_size,
            )
        else:
            # plain-callable fallback: decode each pair per batch
            from .qlearning import load_images

            acts = []
            n = len(all_samples)
            for i in range(0, n, inverse_batch):
                rows = all_samples.iloc[i : i + inverse_batch]
                before = load_images(rows["before_image"], image_size)
                after = load_images(rows["after_image"], image_size)
                acts.append(np.asarray(inverse_labeler(before, after)))
            all_samples["inverse_actions"] = np.concatenate(acts).astype(
                np.int64)
    return all_samples


class TableInverseLabeler:
    """Batched inverse-action labeler (argmax of the calibrated logits,
    reference process_episodes_real.py:176-177) with a decode-once frame
    TABLE fast path.

    The reference labels (before, after) pairs in host batches of 8
    (:164-179) — each frame is decoded AND shipped to the device about
    twice (frame i is row i's before and row i-stride's after). At the
    lifecycle's scale that per-batch wire was the assemble stage's
    bottleneck (44 rows/s, BASELINE.md stage rows, 20-35x slower than
    every neighboring stage). TPU-native shape instead mirrors
    data/device_dataset.py:
      * rows are grouped per VIDEO (before/after always live in the same
        video), so the unique-frame table stays bounded by the longest
        video regardless of corpus size;
      * each unique frame is decoded once (native batched JPEG stage) and
        uploaded once;
      * the (before, after) gathers happen ON DEVICE inside the jitted
        forward, batch-size rows at a time — per-batch host->device
        traffic is two int32 index vectors;
      * tables are jit ARGUMENTS (never closure captures — jit would bake
        them into the program as literal constants, the multi-GB compile
        wedge documented in device_dataset.py) and are padded to power-of-
        two buckets so XLA compiles O(log max_video_len) programs, not one
        per video length.

    Also a plain callable `(before_uint8, after_uint8) -> actions` for
    the pairwise contract assemble_episodes' fallback and
    pseudo-label tooling use."""

    supports_table = True

    def __init__(self, model, params, batch_stats, batch_size: int = 512,
                 decode_chunk: int = 512):
        import jax
        import jax.numpy as jnp

        from video_dqn_tpu.ops.image import normalize_imagenet

        self.batch_size = int(batch_size)
        self.decode_chunk = int(decode_chunk)

        def fwd(before, after):
            prep = lambda x: normalize_imagenet(x.astype(jnp.float32) / 255.0)
            _, logits = model.apply(
                {"params": params, "batch_stats": batch_stats},
                prep(before), prep(after), False,
            )
            return jnp.argmax(logits, axis=-1)

        @jax.jit
        def run_pairs(before, after):
            return fwd(before, after)

        @jax.jit
        def run_table(frames, bidx, aidx):
            return fwd(jnp.take(frames, bidx, axis=0),
                       jnp.take(frames, aidx, axis=0))

        self._run_pairs = run_pairs
        self._run_table = run_table

    def __call__(self, before, after):
        return np.asarray(self._run_pairs(before, after))

    @staticmethod
    def _bucket(n: int) -> int:
        b = 256
        while b < n:
            b *= 2
        return b

    def label_rows(self, before_paths, after_paths, image_size: int):
        """Label every (before, after) path pair; returns (N,) int64."""
        import jax

        from .qlearning import load_images

        n = len(before_paths)
        out = np.empty(n, np.int64)
        groups: Dict[str, list] = {}
        for r, p in enumerate(before_paths):
            groups.setdefault(os.path.dirname(p), []).append(r)

        for rows in groups.values():
            uniq: Dict[str, int] = {}
            bidx = np.empty(len(rows), np.int32)
            aidx = np.empty(len(rows), np.int32)
            for j, r in enumerate(rows):
                bidx[j] = uniq.setdefault(before_paths[r], len(uniq))
                aidx[j] = uniq.setdefault(after_paths[r], len(uniq))
            paths = [None] * len(uniq)
            for p, k in uniq.items():
                paths[k] = p

            table = np.zeros(
                (self._bucket(len(paths)), image_size, image_size, 3),
                np.uint8)
            for i in range(0, len(paths), self.decode_chunk):
                chunk = paths[i : i + self.decode_chunk]
                table[i : i + len(chunk)] = load_images(chunk, image_size)
            table = jax.device_put(table)

            b = self.batch_size
            for i in range(0, len(rows), b):
                nb = min(b, len(rows) - i)
                # pad the tail batch to the full static shape (repeat the
                # window's first row) so XLA compiles one program per
                # (bucket, batch) pair
                bb = np.resize(bidx[i : i + nb], b)
                ab = np.resize(aidx[i : i + nb], b)
                acts = np.asarray(self._run_table(table, bb, ab))[:nb]
                out[np.asarray(rows[i : i + nb])] = acts
        return out


def make_inverse_labeler(model, params, batch_stats,
                         batch_size: int = 512) -> TableInverseLabeler:
    """Jitted batched inverse-action labeler; callable on (before, after)
    uint8 batches, with the decode-once table fast path assemble_episodes
    uses (TableInverseLabeler rationale)."""
    return TableInverseLabeler(model, params, batch_stats,
                               batch_size=batch_size)


def process_episodes(
    location: str = "dataset",
    detections_path: Optional[str] = None,
    inverse_labeler: Optional[Callable] = None,
    stride: int = 3,
    image_size: int = 224,
) -> str:
    """Full stage: read real_detections_raw.npy + filter_out/, write
    <location>/data.feather. Returns the feather path."""
    detections_path = detections_path or os.path.join(
        location, "frames", "real_detections_raw.npy"
    )
    detections = np.load(detections_path, allow_pickle=True)[()]
    df = assemble_episodes(
        detections,
        filters_dir=os.path.join(location, "filter_out"),
        frames_root=os.path.join(location, "frames"),
        stride=stride,
        inverse_labeler=inverse_labeler,
        image_size=image_size,
    )
    out = os.path.join(location, "data.feather")
    write_feather(df, out)
    return out
