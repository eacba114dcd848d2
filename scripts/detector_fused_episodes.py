#!/usr/bin/env python
"""Detector-fused episodes on the real chip, in situ (round-4 verdict #8).

The production-HP fused stop is benched in isolation (646 ms, 92%
compute — scripts/bench_detector_fused_stop.py) and the COMBINE_DETECTOR
policy path is tested with fixture detectors, but no end-to-end episode
run had ever carried the real FlaxDetector at the shipping Mask R-CNN
configuration: compile footprint, per-episode wall, and stability under
the tunnel were unmeasured in situ. This script runs the UNCHANGED eval
CLI (evaluation/run.py) over a furnished-house workload twice on the
same model checkpoint and episode seed:

  unfused — SCORE: model                       (the round-3 shape)
  fused   — + COMBINE_DETECTOR / DETECTOR_WEIGHTS (reference
            evaluation/evaluate.py:97-134: one detectron2 forward per
            view, fused into the Q score when a confident box crosses
            the center third; here one batched FlaxDetector call per
            12-view reasoning stop)

Detector weights are a RANDOM torchvision-format checkpoint (pretrained
weights are environment-blocked — BASELINE.md); navigation quality is
not the claim, wall-clock and stability are. The checkpoint is generated
with the fan-in-scaled recipe the parity tests use
(tests/test_detector_full_parity.py::shared_weights) so class scores
spread realistically across the 0.05 threshold.

Prints one JSON row per leg: seconds/episode, mean SPL, detector
stops/episode (FlaxDetector counts one call per fused stop), and the
derived ms/stop overhead of fusion.

Usage: python scripts/detector_fused_episodes.py \
           --model-exp /tmp/ps_real/exp --model-number 18750 \
           [--episodes 12] [--out /tmp/detfused] [--cpu]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = []


def emit(metric, value, unit, **extra):
    row = {"metric": metric, "value": round(float(value), 4), "unit": unit,
           **extra}
    ROWS.append(row)
    print(json.dumps(row), flush=True)


def make_random_checkpoint(path: str):
    """Random torchvision-named Mask R-CNN state dict (no mask head —
    the product chain runs with_masks=False, like the reference's
    box-score-only use of its predictor, detect_real_videos.py:40-53)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_models import randomize
    from torch_ref_detector import (
        TorchBoxHead,
        TorchFPN,
        TorchResNet50Stages,
        TorchRPNHead,
    )

    body = randomize(TorchResNet50Stages(), seed=1)
    fpn = randomize(TorchFPN(), seed=2)
    rpn = randomize(TorchRPNHead(), seed=3)
    box = randomize(TorchBoxHead(), seed=4)
    with torch.no_grad():
        g = torch.Generator().manual_seed(9)
        box.cls_score.bias.copy_(torch.randn(91, generator=g) * 2.0)
    sd = {}
    sd.update({f"backbone.body.{k}": v for k, v in body.state_dict().items()})
    sd.update({f"backbone.fpn.{k}": v for k, v in fpn.state_dict().items()})
    sd.update({f"rpn.head.{k}": v for k, v in rpn.state_dict().items()})
    for k, v in box.state_dict().items():
        pre = ("roi_heads.box_head." if k.startswith(("fc6", "fc7"))
               else "roi_heads.box_predictor.")
        sd[pre + k] = v
    torch.save(sd, path)


def run_eval(cfg_path: str, episodes: int, cpu: bool):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
    if cpu:
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env.pop("JAX_PLATFORM_NAME", None)
        env.pop("JAX_PLATFORMS", None)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-u", "evaluation/run.py",
         "--workload", str(episodes), "--furnished-env", "-r", cfg_path],
        cwd=REPO, env=env, capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        sys.exit(f"eval failed ({r.returncode}):\n"
                 f"{r.stdout[-4000:]}\n{r.stderr[-4000:]}")
    spl = calls = None
    for line in r.stdout.splitlines():
        if line.startswith("Mean SPL:"):
            spl = float(line.split(":", 1)[1].strip())
        m = re.match(r"Detector calls:\s*(\d+)", line)
        if m:
            calls = int(m.group(1))
    assert spl is not None, f"no Mean SPL in output:\n{r.stdout[-2000:]}"
    return dt, spl, calls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/detfused")
    ap.add_argument("--model-exp", default="/tmp/ps_real/exp")
    ap.add_argument("--model-number", type=int, default=18750)
    ap.add_argument("--episodes", type=int, default=12)
    ap.add_argument("--confidence-threshold", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import yaml

    os.makedirs(args.out, exist_ok=True)
    ckpt = os.path.join(args.out, "random_maskrcnn.torch")
    if not os.path.exists(ckpt):
        make_random_checkpoint(ckpt)

    base = {
        "SCORE": "model", "MODEL_CONFIG_LOCATION": args.model_exp,
        "MODEL_NUMBER": args.model_number, "SLAM": True, "SEED": 1,
    }
    legs = {
        "unfused": dict(base,
                        RESULT_LOCATION=os.path.join(args.out, "results_un")),
        "fused": dict(base,
                      RESULT_LOCATION=os.path.join(args.out, "results_fu"),
                      COMBINE_DETECTOR=True,
                      CONFIDENCE_THRESHOLD=args.confidence_threshold,
                      DETECTOR_WEIGHTS=ckpt),
    }
    walls = {}
    for tag, cfg in legs.items():
        cfg_path = os.path.join(args.out, f"eval_{tag}.yml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        dt, spl, calls = run_eval(cfg_path, args.episodes, args.cpu)
        walls[tag] = dt
        extra = {"episodes": args.episodes, "mean_spl": spl}
        if calls is not None:
            extra["detector_stops"] = calls
            extra["stops_per_episode"] = round(calls / args.episodes, 2)
        emit(f"detfused_{tag}_s_per_ep", dt / args.episodes, "s/episode",
             **extra)

    if legs["fused"] and walls.get("fused") and walls.get("unfused"):
        # derived: what each fused stop cost in situ (includes the host
        # round-trip the isolated bench measured at 646 ms/stop)
        calls = next((r.get("detector_stops") for r in ROWS
                      if r["metric"] == "detfused_fused_s_per_ep"), None)
        if calls:
            emit("detfused_overhead_ms_per_stop",
                 (walls["fused"] - walls["unfused"]) / calls * 1e3,
                 "ms/stop", stops=calls)

    with open(os.path.join(args.out, "rows.json"), "w") as f:
        json.dump(ROWS, f, indent=1)


if __name__ == "__main__":
    main()
