#!/usr/bin/env python
"""Real-chip cost of a detector-fused reasoning stop at the PRODUCTION
Mask R-CNN configuration (1000 proposals into the ROI heads — round-3
Missing #1 asked for this measurement).

Times the exact product-path call: `FlaxDetector(batch_of_12_views)`
through `eval.runner.build_detector_from_config` (bf16, num_proposals
1000, det_candidates 1000, max_detections 100), i.e. what
fuse_detector_scores issues once per 12-view semantic-reasoning stop when
COMBINE_DETECTOR is on (reference runs one detectron2 predictor forward
per view, evaluate.py:117-134).

Prints JSON lines: compile_s (first call, cold-or-cached), steady
ms/stop + views/sec.

Usage: python scripts/bench_detector_fused_stop.py --weights <ckpt.torch>
       (generate a random torchvision-format checkpoint with
        tests/test_detector_full_parity.py's shared_weights recipe)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True)
    parser.add_argument("--views", type=int, default=12)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

    from video_dqn_tpu.models.detector.inference import load_detector

    t0 = time.perf_counter()
    detector = load_detector(args.weights)
    t_load = time.perf_counter() - t0
    m = detector.model
    print(json.dumps({
        "metric": "detector_load_s", "value": round(t_load, 2),
        "num_proposals": m.num_proposals, "det_candidates": m.det_candidates,
        "max_detections": m.max_detections, "pre_nms": m.pre_nms_topk,
        "post_nms": m.post_nms_topk,
    }), flush=True)

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (args.views, args.size, args.size, 3),
                         dtype=np.uint8)

    t0 = time.perf_counter()
    detector(batch)  # one fused stop: compile + execute
    compile_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "fused_stop_first_call_s", "value": round(compile_s, 2),
        "views": args.views, "size": args.size,
    }), flush=True)

    times = []
    for i in range(args.iters):
        b = rng.integers(0, 255, batch.shape, dtype=np.uint8)
        t0 = time.perf_counter()
        detector(b)
        times.append(time.perf_counter() - t0)
    steady = float(np.median(times))
    print(json.dumps({
        "metric": "detector_fused_stop", "value": round(steady * 1e3, 1),
        "unit": "ms/stop", "views_per_sec": round(args.views / steady, 1),
        "min_ms": round(min(times) * 1e3, 1),
        "max_ms": round(max(times) * 1e3, 1),
        "views": args.views, "size": args.size,
    }), flush=True)


if __name__ == "__main__":
    main()
