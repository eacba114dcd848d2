#!/usr/bin/env python
"""Results CLI — parity with /root/reference/evaluation/results.py:15-20:
merge result shards for a config and print per-episode + mean SPL."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="show eval results")
    parser.add_argument("config", help="eval config yml")
    args = parser.parse_args()

    from video_dqn_tpu.eval import display_results, load_file

    display_results(load_file(args.config))


if __name__ == "__main__":
    main()
