"""Frame filtering: indoor-scene probability (Places365) + person
detection, with the reference's exact smoothing and output contract.

Capability parity with /root/reference/dataset/extract_frames.py:41-47,
143-211:
  * io map: label -> 1 if indoor (io_places.txt column is 1=indoor,
    2=outdoor; the reference computes `2 - col`)
  * indoor probability: sum of softmax probs of the top-10 classes that
    map to indoor
  * person flag: COCO class 1 among the detector's top-5 labels
  * smoothing: gaussian sigma=6 on indoor probs then round; person flags
    smoothed with the reference's sequential in-place windowed-mean round
    (window 6) — in-place matters, smoothed values feed later windows
  * output: {'indoor_locs', 'person_locs'} as flat argwhere index arrays
    (0-based positions over frames 1..N — the same convention the episode
    assembler consumes)

TPU-first: indoor classification is one batched jitted program over all of
a video's frames (top_k + indoor-mask dot), not a per-frame forward.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data", "places365")


def load_io_map(path: Optional[str] = None) -> Dict[str, int]:
    """label -> 1 (indoor) / 0 (outdoor)."""
    path = path or os.path.join(_DATA_DIR, "io_places.txt")
    out = {}
    with open(path) as f:
        for line in f:
            label, val = line.split()
            out[label[3:]] = 2 - int(val)
    return out


def load_categories(path: Optional[str] = None):
    path = path or os.path.join(_DATA_DIR, "categories_places365.txt")
    classes = []
    with open(path) as f:
        for line in f:
            classes.append(line.strip().split(" ")[0][3:])
    return tuple(classes)


def indoor_mask_vector(categories=None, io_map=None) -> np.ndarray:
    """(365,) float mask: 1 where the class is indoor."""
    categories = categories or load_categories()
    io_map = io_map or load_io_map()
    return np.array([float(io_map[c]) for c in categories], np.float32)


def make_indoor_classifier(model, params, indoor_mask: Optional[np.ndarray] = None):
    """Batched jitted indoor-probability scorer: uint8 (B, H, W, 3) images
    (pre-resized to 224) -> (B,) sum of top-10 softmax probs on indoor
    classes."""
    import jax
    import jax.numpy as jnp

    from video_dqn_tpu.ops.image import normalize_imagenet

    mask = jnp.asarray(
        indoor_mask if indoor_mask is not None else indoor_mask_vector()
    )

    @jax.jit
    def run(images):
        x = normalize_imagenet(images.astype(jnp.float32) / 255.0)
        logits = model.apply({"params": params}, x, False)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, 10)
        return (top_p * mask[top_i]).sum(axis=-1)

    return lambda images: np.asarray(run(np.asarray(images)))


PERSON_CLASS = 1  # torchvision-style COCO label index


def person_in_top5(labels) -> bool:
    """True if 'person' is among the detector's first 5 labels (detections
    are score-sorted; reference extract_frames.py:144-148)."""
    return PERSON_CLASS in list(labels)[:5]


def smooth_binary_inplace(values, window: int = 6) -> np.ndarray:
    """The reference's sequential in-place rounded-mean smoother
    (extract_frames.py:151-157): each position is replaced by the rounded
    mean of its window, and that replacement feeds later windows."""
    v = list(np.asarray(values, np.float64))
    half = window // 2
    for i in range(half, len(v) - half):
        v[i] = round(float(np.mean(v[i - half : i + half])))
    return np.array(v)


def gaussian_smooth_round(values, sigma: float = 6.0) -> np.ndarray:
    """gaussian_filter1d + per-element round (extract_frames.py:182-184)."""
    from scipy.ndimage import gaussian_filter1d

    sm = gaussian_filter1d(np.asarray(values, np.float64), sigma=sigma)
    return np.array([round(x) for x in sm])


def filter_frames(
    indoor_probs,
    person_flags,
    sigma: float = 6.0,
    window: int = 6,
) -> Dict[str, np.ndarray]:
    """Per-video filter output {'indoor_locs', 'person_locs'}."""
    indoor = gaussian_smooth_round(indoor_probs, sigma)
    person = smooth_binary_inplace(np.asarray(person_flags, np.int64), window)
    return {
        "indoor_locs": np.argwhere(indoor).flatten(),
        "person_locs": np.argwhere(person).flatten(),
    }


def run_filter_pass(
    frames_root: str,
    out_dir: str,
    indoor_scorer: Callable,
    person_detector: Callable,
    batch_size: int = 32,
    image_size: int = 224,
) -> Dict[str, str]:
    """Filter every video folder under frames_root into
    out_dir/<vid>_filters.npy (skip-if-exists resume,
    reference :208-209). `person_detector(images)` returns per-image
    label lists (score-sorted)."""
    import re

    from .qlearning import load_images

    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for vid in sorted(os.listdir(frames_root)):
        folder = os.path.join(frames_root, vid)
        if not os.path.isdir(folder):
            continue
        out_path = os.path.join(out_dir, f"{vid}_filters.npy")
        if os.path.exists(out_path):
            continue
        files = sorted(
            f for f in os.listdir(folder) if re.fullmatch(r"\d+\.jpg", f)
        )
        if not files:
            continue
        indoor_probs, person_flags = [], []
        for i in range(0, len(files), batch_size):
            chunk = files[i : i + batch_size]
            images = load_images(
                [os.path.join(folder, f) for f in chunk], image_size
            )
            indoor_probs.extend(indoor_scorer(images).tolist())
            for labels in person_detector(images):
                person_flags.append(person_in_top5(labels))
        data = filter_frames(indoor_probs, person_flags)
        # stored as a 0-d object array; read back with np.load(...)[()]
        # (same contract as the reference's filter_out npy files)
        np.save(out_path, data, allow_pickle=True)
        written[vid] = out_path
    return written
