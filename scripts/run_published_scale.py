#!/usr/bin/env python
"""Run the published workload at full scale through the product train CLI,
with a mid-run kill + `-r` resume: the reference contract is 300k steps x
batch 16 = 4.8M sample draws from a fixed feather
(/root/reference/configs/experiments/real_data/config.yml,
train_q_network.py:241-247,286-294); this framework's batch-256 embodiment
is 18,750 steps at 224 px.

The infeed is the HBM-resident dataset mode (TPU.DEVICE_DATASET — decode
every unique JPEG once, upload once, sample on device): BASELINE.md's
host-fed rows show the per-step host->HBM wire is this tunnel's infeed
ceiling (~180 f/s), so at 4.8M draws streaming would take ~7 h while the
chip idles; a dataset that fits HBM removes the wire from the steady
state entirely and trains at the device-resident rate.

Stages:
  1. build a real-JPEG corpus + feather at 224 px (once; ~19k frames)
  2. train_q_network.py <exp>  — SIGKILLed mid-run after --kill-after s
  3. train_q_network.py -r <exp> — resume from the latest checkpoint to
     the full 18,750 steps
  4. report: sustained f/s (from metrics.jsonl), checkpoint count, loss
     curve summary; one JSON line per row

Usage: python scripts/run_published_scale.py [--out /tmp/published]
       [--steps 18750] [--batch 256] [--kill-grace 20]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(float(value), 4),
                      "unit": unit, **extra}), flush=True)


def launch_train(exp, resume=False):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
    argv = [sys.executable, "-u", "train_q_network.py"]
    if resume:
        argv.append("-r")
    argv.append(exp)
    return subprocess.Popen(argv, cwd=REPO, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/published_scale")
    ap.add_argument("--steps", type=int, default=18750)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--frames-per-video", type=int, default=800)
    ap.add_argument("--checkpoint-interval", type=int, default=1250)
    ap.add_argument("--kill-grace", type=float, default=20.0,
                    help="seconds past the second checkpoint before the "
                         "SIGKILL lands")
    args = ap.parse_args()

    import yaml

    from video_dqn_tpu.data.synthetic import make_synthetic_dataset

    # ---- 1. corpus -----------------------------------------------------
    root = os.path.join(args.out, "ds")
    feather = os.path.join(root, "data.feather")
    t0 = time.time()
    if not os.path.exists(feather):
        feather = make_synthetic_dataset(
            root, num_videos=args.videos,
            frames_per_video=args.frames_per_video,
            image_size=args.image_size)
        emit("published_scale_corpus_build_s", time.time() - t0, "seconds",
             frames=args.videos * args.frames_per_video)

    exp = os.path.join(args.out, "exp")
    os.makedirs(exp, exist_ok=True)
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump({
            "DATASET": feather, "PANORAMA": False,
            "ARCHITECTURE": "extra_capacity", "USE_INVERSE_ACTIONS": True,
            "LOSS_CLIP": "rect", "GAMMA": 0.99, "LEARNING_RATE": 0.0001,
            "NUM_STEPS": args.steps,
            "CHECKPOINT_INTERVAL": args.checkpoint_interval,
            "TARGET_UPDATE_INTERVAL": 8000, "SEED": 4,
            "TPU": {"BATCH_SIZE": args.batch, "IMAGE_SIZE": args.image_size,
                    "DEVICE_DATASET": True},
        }, f)

    models = os.path.join(exp, "models")

    # ---- 2. first leg, killed mid-run ----------------------------------
    import re

    def ckpt_steps():
        if not os.path.isdir(models):
            return []
        return sorted(int(m.group(1)) for fn in os.listdir(models)
                      if (m := re.match(r"sample(\d+)\.ckpt", fn)))

    if not ckpt_steps():
        p = launch_train(exp)
        t0 = time.time()
        killed = False
        while p.poll() is None:
            # SIGKILL once the run is demonstrably past its second
            # checkpoint (fixed timers would race the cold tunnel compile)
            cs = ckpt_steps()
            if len(cs) >= 2 and cs[-1] < args.steps:
                time.sleep(args.kill_grace)
                if p.poll() is None:
                    p.send_signal(signal.SIGKILL)
                    killed = True
                break
            time.sleep(5.0)
        out = p.stdout.read()
        p.wait()
        sys.stdout.write(out[-1500:])
        if not killed:
            sys.exit("first leg finished before the kill could land — "
                     "raise --steps or lower --checkpoint-interval")
        emit("published_scale_killed_at_step", max(ckpt_steps()), "step",
             seconds=round(time.time() - t0, 1))

    # ---- 3. resume to completion ----------------------------------------
    t0 = time.time()
    p = launch_train(exp, resume=True)
    out, _ = p.communicate()
    sys.stdout.write(out[-2000:])
    assert p.returncode == 0, f"resume leg failed ({p.returncode})"
    resume_s = time.time() - t0

    # ---- 4. report -------------------------------------------------------
    from video_dqn_tpu.core.metrics import read_metrics

    run_dirs = [os.path.join(exp, d) for d in os.listdir(exp)
                if d.startswith("run")]
    rows = []
    for d in sorted(run_dirs):
        rows += read_metrics(d)
    rates = [r for r in rows if r["tag"] == "frames_per_sec/train"]
    losses = [r for r in rows if r["tag"] == "avg_q_loss/train"]
    losses.sort(key=lambda r: r["step"])
    import numpy as np

    sustained = float(np.median([r["value"] for r in rates])) if rates else 0.0
    import re

    ckpts = sorted(int(m.group(1)) for fn in os.listdir(models)
                   if (m := re.match(r"sample(\d+)\.ckpt", fn)))
    assert ckpts[-1] == args.steps, f"final checkpoint {ckpts[-1]} != {args.steps}"
    emit("published_scale_frames_per_sec", sustained, "frames/sec",
         steps=args.steps, batch=args.batch,
         sample_draws=args.steps * args.batch,
         checkpoints=len(ckpts), resume_leg_seconds=round(resume_s, 1),
         loss_first=round(losses[0]["value"], 4) if losses else None,
         loss_last=round(losses[-1]["value"], 4) if losses else None,
         n_loss_points=len(losses))


if __name__ == "__main__":
    main()
