#!/usr/bin/env python
"""Download the YouTube house-tour corpus — CLI parity with
/root/reference/dataset/download_videos.py (urls.npy of 11-char ids,
skip-completed resume, 429 backoff). Requires network + pytube."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from video_dqn_tpu.data.download import download_videos


def main():
    urls = np.load("dataset/urls.npy")
    print("Num videos:", urls.shape[0])
    done, failures = download_videos(urls.tolist(), "dataset/videos")
    print("downloaded:", len(done))
    print("failures:", failures)


if __name__ == "__main__":
    main()
