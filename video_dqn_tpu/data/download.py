"""Video downloader with resume + exponential backoff.

Capability parity with /root/reference/dataset/download_videos.py:26-77:
walk the id list, skip already-downloaded ids, fetch the best mp4 stream
(1080p preferred, then 720p), exponential backoff on HTTP 429 (base 10 s,
doubling), collect failures. The fetch itself is injectable (`fetcher`)
because this environment is zero-egress and pytube is not installed; the
default fetcher reports the missing dependency clearly.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, List, Optional, Tuple


class RateLimited(Exception):
    """HTTP 429-equivalent: triggers exponential backoff."""


class NoStreamFound(Exception):
    pass


def default_fetcher(vid_id: str, dest_dir: str) -> str:
    """Download via pytube if importable (it is not in this image)."""
    try:
        from pytube import YouTube
    except ImportError as e:
        raise RuntimeError(
            "pytube is not installed and this environment has no network "
            "egress; inject a fetcher(vid_id, dest_dir) -> path"
        ) from e
    video = YouTube(f"https://www.youtube.com/watch?v={vid_id}")
    streams = [
        s for s in video.streams.filter(file_extension="mp4")
        if s.resolution in ("1080p", "720p")
    ]
    streams.sort(key=lambda s: s.resolution != "1080p")
    if not streams:
        raise NoStreamFound(vid_id)
    path = streams[0].download(dest_dir)
    final = os.path.join(dest_dir, f"{vid_id}.mp4")
    os.replace(path, final)
    return final


def download_videos(
    ids: Iterable[str],
    dest_dir: str,
    fetcher: Callable[[str, str], str] = default_fetcher,
    base_sleep: float = 10.0,
    max_sleep: float = 600.0,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> Tuple[List[str], List[str]]:
    """Returns (downloaded_ids, failed_ids). Skips ids whose mp4 already
    exists; on RateLimited, sleeps with doubling backoff and retries the
    same id."""
    os.makedirs(dest_dir, exist_ok=True)
    completed = {f[:-4] for f in os.listdir(dest_dir) if f.endswith(".mp4")}
    remaining = [v for v in ids if v not in completed]
    done, failures = [], []
    sleep_time = base_sleep
    for vid_id in remaining:
        while True:
            try:
                fetcher(vid_id, dest_dir)
                done.append(vid_id)
            except RateLimited:
                sleep_fn(sleep_time)
                sleep_time = min(sleep_time * 2, max_sleep)
                continue
            except Exception:
                failures.append(vid_id)
            sleep_time = base_sleep
            break
    return done, failures
