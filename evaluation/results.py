#!/usr/bin/env python
"""Results CLI — parity with /root/reference/evaluation/results.py:15-20:
merge result shards for a config and print per-episode + mean SPL."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="show eval results")
    parser.add_argument("config", help="eval config yml, or a result-shard "
                                       "folder with --folder")
    parser.add_argument("--folder", action="store_true",
                        help="treat the argument as a DiskLogger shard "
                             "folder (e.g. evaluation/artifacts) instead "
                             "of a config")
    args = parser.parse_args()

    if args.folder:
        import numpy as np

        from video_dqn_tpu.core import DiskReader

        data = DiskReader(args.config).data()
        if not data:
            print("no result shards found")
            return
        for k in sorted(data):
            print(f"Episode {k}: SPL {data[k]}")
        print(f"Mean SPL: {np.mean([float(v) for v in data.values()])} "
              f"({len(data)} episodes)")
        return

    from video_dqn_tpu.eval import display_results, load_file

    display_results(load_file(args.config))


if __name__ == "__main__":
    main()
