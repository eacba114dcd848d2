"""Video -> frame extraction.

Capability parity with the reference's ffmpeg-subprocess dump
(/root/reference/dataset/extract_frames.py:112-141: `fps=0.5` ->
frames/<vid>/%04d.jpg, skip-existing resume). Two engines:

  * native: the in-process libavcodec stage (native/decode/decode.cc via
    data/native_decode.py) — demux + decode + swscale with frames sampled
    at the fps grid, no subprocess, no intermediate JPEG. Production path.
  * cv2: OpenCV VideoCapture loop — fallback and test oracle; its sampling
    grid matches ffmpeg's fps filter (one frame per 1/fps-second interval).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np


def extract_frames(video_path: str, dest: str, fps: float = 0.5,
                   engine: Optional[str] = None) -> int:
    """Decode `video_path`, writing dest/%04d.jpg at `fps`. Returns the
    number of frames written."""
    import cv2

    os.makedirs(dest, exist_ok=True)

    if engine in (None, "native"):
        from . import native_decode

        if native_decode.available():
            written = 0
            for frame in native_decode.decode_frames(video_path, fps=fps):
                written += 1
                cv2.imwrite(
                    os.path.join(dest, f"{written:04d}.jpg"),
                    frame[:, :, ::-1],  # RGB -> BGR for imwrite
                )
            return written
        if engine == "native":
            raise RuntimeError("libvdecode unavailable")
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open {video_path}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
    duration = n_frames / src_fps if n_frames else 0.0
    # ffmpeg fps filter: output frame k (0-based) samples the source frame
    # whose timestamp is nearest k/fps (first interval midpoint rule is
    # equivalent for constant-rate sources)
    out_times = np.arange(0, max(duration, 1.0 / fps), 1.0 / fps)
    written = 0
    next_out = 0
    frame_idx = 0
    ok, frame = cap.read()
    while ok and next_out < len(out_times):
        t = frame_idx / src_fps
        if t + 0.5 / src_fps >= out_times[next_out]:
            next_out += 1
            written += 1
            cv2.imwrite(os.path.join(dest, f"{written:04d}.jpg"), frame)
        frame_idx += 1
        ok, frame = cap.read()
    cap.release()
    return written


def extract_all_frames(videos_dir: str, frames_dir: str, fps: float = 0.5) -> List[str]:
    """Dump every <id>.mp4 under videos_dir; skip ids whose frame folder
    already exists (resume semantics, reference :133-141)."""
    os.makedirs(frames_dir, exist_ok=True)
    done = []
    for vid in sorted(os.listdir(videos_dir)):
        m = re.match(r"(.*)\.mp4$", vid)
        if not m:
            continue
        vid_id = m.group(1)
        subdir = os.path.join(frames_dir, vid_id)
        if os.path.isdir(subdir):
            continue
        extract_frames(os.path.join(videos_dir, vid), subdir, fps=fps)
        done.append(vid_id)
    return done


def write_synthetic_video(path: str, num_frames: int = 48, size: int = 96,
                          fps: float = 24.0, seed: int = 0) -> str:
    """Test fixture: an mp4 with deterministic per-frame content."""
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, (size, size))
    base = rng.integers(0, 255, (size, size, 3), np.uint8)
    for i in range(num_frames):
        frame = np.roll(base, i * 3, axis=1)
        cv2.putText(frame, str(i), (5, size // 2), cv2.FONT_HERSHEY_SIMPLEX,
                    1, (255, 255, 255), 2)
        w.write(frame)
    w.release()
    return path
