#!/usr/bin/env python
"""The reference's OWN lifecycle, from video BYTES to a navigating model,
as one artifact — the product front door the five dataset CLIs form
(/root/reference/README.md:28-40):

  1. encode:   walk the furnished two-floor house and encode the walks
               into real H.264 mp4s (native/decode/encode.cc) — the same
               bytes family as the reference's YouTube corpus
               (/root/reference/dataset/download_videos.py)
  2. extract:  `dataset/extract_frames.py --dump`   (CLI, subprocess)
  3. filter:   `dataset/extract_frames.py --stub-detector
               --allow-passthrough`                  (CLI, subprocess)
  4. detect:   `dataset/detect_real_videos.py --stub` (CLI, subprocess)
  5. assemble: `dataset/process_episodes_real.py --inverse-flax` with an
               inverse model this script trains on generated state pairs
               (zero action labels — the paper's loop,
               /root/reference/dataset/process_episodes_real.py:164-179)
  6. train:    `train_q_network.py <exp>`            (CLI, subprocess)
  7. eval:     `evaluation/run.py --workload N --furnished-env --batched`
               model-scored SPL                      (CLI, subprocess)

The stub detector carries no reward signal (pretrained Mask R-CNN weights
cannot be fetched in this container — BASELINE.md documents the blocker),
so after proving the five CLIs compose on stub detections, the detection
artifact is re-written from the walks' ground-truth object proximity (the
sidecar recorded at render time, exactly the (5,2)-array contract
data/detect.py emits) and stages 5-7 run again — same CLIs, real signal.

Prints one JSON line per stage (throughput) and per result row (SPL).

Usage: python scripts/lifecycle_video_bytes.py --out /tmp/lifecycle
       [--size 96] [--videos 8] [--video-steps 150] [--steps 1500]
       [--batch 256] [--episodes 20] [--skip-stub-variant]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

# The orchestrator itself stays OFF the TPU: the axon tunnel is a
# single-client device, and this process only renders (native C++
# raycaster + numpy) and shepherds subprocesses — every device stage
# (inverse CLI, train CLI, eval CLI) runs as its own sequential
# subprocess that gets the chip to itself. Must happen before the
# video_dqn_tpu import re-asserts the platform choice.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = []


def emit(metric, value, unit, **extra):
    row = {"metric": metric, "value": round(float(value), 4), "unit": unit,
           **extra}
    ROWS.append(row)
    print(json.dumps(row), flush=True)


def _parse_mean_spl(out: str) -> float:
    for line in out.splitlines():
        if line.startswith("Mean SPL:"):
            return float(line.split(":", 1)[1].strip())
    raise AssertionError(f"no Mean SPL in eval output:\n{out[-2000:]}")


def run_cli(argv, cpu=False, env_extra=None):
    """Run a product CLI as a subprocess (the front door, unchanged)."""
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
    if cpu:
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
    else:
        # drop the orchestrator's own CPU pin so the sitecustomize
        # default (the real TPU) applies in the child
        env.pop("JAX_PLATFORM_NAME", None)
        env.pop("JAX_PLATFORMS", None)
    if env_extra:
        env.update(env_extra)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-u"] + argv, cwd=REPO, env=env,
                       capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        sys.exit(f"CLI {' '.join(argv)} failed ({r.returncode}):\n"
                 f"{r.stdout[-4000:]}\n{r.stderr[-4000:]}")
    return dt, r.stdout


def render_and_encode(args, root):
    """Stage 1: random walks -> H.264 mp4s + ground-truth sidecars."""
    import numpy as np

    from video_dqn_tpu.data.native_decode import encode_video
    from video_dqn_tpu.data.sim_dataset import random_walk
    from video_dqn_tpu.eval.fixtures import make_furnished_house
    from video_dqn_tpu.sim.gibson import CLASS_LABELS, relevant_locations

    env, house = make_furnished_house(size_px=args.size, seed=0)
    dests = {c: house.object_locations_for_habitat_dest.get(c, [])
             for c in CLASS_LABELS}
    videos_dir = os.path.join(root, "videos")
    os.makedirs(videos_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    oracle = {}       # {vid: {frame_id: (5,2) class array}}
    true_actions = {}  # {vid: {frame_id: action}}
    n_frames = 0
    t0 = time.time()
    for v in range(args.videos):
        vid = f"walk{v:04d}"
        floor = v % getattr(env, "num_floors", 1)
        pos, ang = env.sample_start_state(floor)
        env.set_agent_state(pos, ang)
        frames, det, acts = [], {}, {}
        for i, (obs, action) in enumerate(
                random_walk(env, args.video_steps, rng), start=1):
            frames.append(np.asarray(obs["rgb"]))
            acts[i] = int(action)
            arr = np.empty((5, 2), object)
            for k, cls in enumerate(CLASS_LABELS):
                goals = relevant_locations(env.pos, dests[cls])
                d = min((env.geodesic_distance(env.pos, g) for g in goals),
                        default=float("inf"))
                if d < args.reward_dist:
                    arr[k, 0] = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
                    arr[k, 1] = np.array([0.99], np.float32)
                else:
                    arr[k, 0] = np.zeros((0, 4), np.float32)
                    arr[k, 1] = np.zeros((0,), np.float32)
            det[i] = arr
        # one walk step per sample tick: encode at the extraction rate
        # (0.5 fps) so dataset/extract_frames.py --dump recovers frame i
        # <-> walk step i exactly
        encode_video(os.path.join(videos_dir, vid + ".mp4"), frames, fps=0.5)
        oracle[vid] = det
        true_actions[vid] = acts
        n_frames += len(frames)
    dt = time.time() - t0
    np.save(os.path.join(root, "oracle_detections.npy"), oracle,
            allow_pickle=True)
    np.save(os.path.join(root, "true_actions.npy"), true_actions,
            allow_pickle=True)
    mp4_bytes = sum(
        os.path.getsize(os.path.join(videos_dir, f))
        for f in os.listdir(videos_dir))
    emit("lifecycle_encode_frames_per_sec", n_frames / dt, "frames/sec",
         videos=args.videos, mp4_mb=round(mp4_bytes / 1e6, 2))
    return env, house, n_frames


def train_inverse(args, root):
    """Zero-action-label seam: inverse model on generated state pairs,
    trained through the product CLI (train_inverse_model.py) so the device
    stage runs in its own subprocess."""
    from video_dqn_tpu.data.sim_dataset import generate_inverse_pairs
    from video_dqn_tpu.eval.fixtures import make_furnished_house

    pairs_root = os.path.join(root, "inverse_pairs")
    train_npy = os.path.join(pairs_root, "inverse_train_data.npy")
    if not os.path.exists(train_npy):
        walk_env, _ = make_furnished_house(size_px=args.size, seed=11)
        generate_inverse_pairs(
            walk_env, pairs_root, n_walks=args.inverse_walks,
            steps_per_walk=args.inverse_walk_steps, seed=11)
    out_dir = os.path.join(root, "inverse_model")
    t0 = time.time()
    dt, out = run_cli(
        ["train_inverse_model.py",
         "--train_data", train_npy,
         "--val_data", os.path.join(pairs_root, "inverse_val_data.npy"),
         "--image_root", os.path.join(pairs_root, "states"),
         "--out_dir", out_dir, "--image_size", str(args.size),
         "--batch_size", str(args.inverse_batch),
         "--num_steps", str(args.inverse_steps),
         "--seed", "0", "--cache-images"],
        cpu=args.cpu)
    acc = None
    for line in out.splitlines():
        if line.startswith("Final val accuracy:"):
            acc = float(line.split(":", 1)[1])
    assert acc is not None, f"no final accuracy in CLI output:\n{out[-2000:]}"
    emit("lifecycle_inverse_val_accuracy", acc, "accuracy",
         seconds=round(time.time() - t0, 1))
    return out_dir


def assemble(args, root, tag):
    """Stage 5: the assembly CLI with the framework-trained inverse model.
    A DEVICE stage since round 5: inverse labeling runs on the chip via
    the decode-once frame table (data/episodes.TableInverseLabeler) — the
    round-4 artifact ran it host-side at 44 rows/s, 20-35x below every
    neighboring stage."""
    dt, out = run_cli(
        ["dataset/process_episodes_real.py", "--location", root,
         "--inverse-flax", os.path.join(root, "inverse_model"),
         "--image-size", str(args.size)],
        cpu=args.cpu)
    import numpy as np
    import pandas as pd

    feather = os.path.join(root, "data.feather")
    df = pd.read_feather(feather)
    sparse = [c for c in df.columns if c.startswith("sparse_reward")]
    ratio = float((df[sparse].to_numpy().sum(1) > 0).mean()) if len(df) else 0.0
    # pseudo-label agreement with the walks' true actions (diagnostic —
    # the pipeline itself never sees them)
    acts = np.load(os.path.join(root, "true_actions.npy"),
                   allow_pickle=True)[()]
    truth = np.array([
        acts[os.path.basename(os.path.dirname(p))][
            int(os.path.basename(p).split(".")[0])]
        for p in df["before_image"]])
    agree = float((df["inverse_actions"].to_numpy() == truth).mean())
    emit(f"lifecycle_assemble_{tag}_rows_per_sec", len(df) / dt, "rows/sec",
         rows=int(len(df)), reward_ratio=round(ratio, 4),
         pseudo_label_agreement=round(agree, 4))
    return feather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/lifecycle")
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--video-steps", type=int, default=150)
    ap.add_argument("--reward-dist", type=float, default=1.5)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--inverse-walks", type=int, default=8)
    ap.add_argument("--inverse-walk-steps", type=int, default=250)
    ap.add_argument("--inverse-steps", type=int, default=1500)
    ap.add_argument("--inverse-batch", type=int, default=128)
    ap.add_argument("--corpus-only", action="store_true",
                    help="stop after the CPU-side corpus stages (encode/"
                         "extract/filter + stub detect) — lets a scale "
                         "probe prepare its corpus while the chip is "
                         "busy elsewhere; re-run without the flag to "
                         "resume at the device stages")
    ap.add_argument("--skip-stub-variant", action="store_true",
                    help="skip the stub-detector composition pass "
                         "(oracle-detections variant only)")
    ap.add_argument("--host-fed", action="store_true",
                    help="train stage streams batches from host instead "
                         "of the HBM-resident dataset (the round-4 shape)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the train/eval CLIs on the CPU backend too "
                         "(tests; default puts them on the TPU)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import yaml

    root = os.path.join(args.out, "dataset")
    os.makedirs(root, exist_ok=True)

    # ---- 1. video bytes ---------------------------------------------------
    if not os.path.isdir(os.path.join(root, "videos")):
        render_and_encode(args, root)

    # ---- 2. extract (CLI) -------------------------------------------------
    frames_dir = os.path.join(root, "frames")
    if not os.path.isdir(frames_dir):
        dt, out = run_cli(
            ["dataset/extract_frames.py", "--dump",
             "--location", os.path.join(root, "videos"),
             "--frames", frames_dir],
            cpu=True)
        n_jpg = sum(len(files) for _, _, files in os.walk(frames_dir))
        assert n_jpg == args.videos * args.video_steps, \
            f"extracted {n_jpg} != rendered {args.videos * args.video_steps}"
        emit("lifecycle_extract_frames_per_sec", n_jpg / dt, "frames/sec",
             frames=n_jpg)

    # ---- 3. filter (CLI) --------------------------------------------------
    filter_dir = os.path.join(root, "filter_out")
    if not os.path.isdir(filter_dir):
        dt, out = run_cli(
            ["dataset/extract_frames.py", "--frames", frames_dir,
             "--out", filter_dir, "--stub-detector", "--allow-passthrough"],
            cpu=True)
        emit("lifecycle_filter_frames_per_sec",
             args.videos * args.video_steps / dt, "frames/sec")

    det_path = os.path.join(frames_dir, "real_detections_raw.npy")
    stub_feather = os.path.join(root, "data_stub.feather")

    # ---- 4 stub detect (CPU; part of the corpus phase) ---------------------
    if not args.skip_stub_variant and not os.path.exists(det_path) \
            and not os.path.exists(stub_feather):
        dt, out = run_cli(
            ["dataset/detect_real_videos.py", "--stub", "--location", root,
             "--image-size", str(args.size)],
            cpu=True)
        emit("lifecycle_detect_stub_frames_per_sec",
             args.videos * args.video_steps / dt, "frames/sec")

    if args.corpus_only:
        _flush_rows(args)
        print("corpus phase complete (--corpus-only); re-run without the "
              "flag for the device stages", flush=True)
        return

    # ---- 5a. inverse model (zero action labels) ---------------------------
    from video_dqn_tpu.core import latest_checkpoint_step

    if latest_checkpoint_step(os.path.join(root, "inverse_model")) is None:
        train_inverse(args, root)

    # ---- 5 stub variant: all five CLIs, unchanged --------------------------
    if not args.skip_stub_variant and not os.path.exists(stub_feather):
        assemble(args, root, "stub")
        shutil.move(os.path.join(root, "data.feather"), stub_feather)

    # ---- 4' oracle detections: the converted-weights stand-in -------------
    # (pretrained Mask R-CNN weights are environment-blocked; the sidecar
    # recorded at render time IS what a correct detector would emit for
    # these walks, in the exact artifact format of data/detect.py)
    shutil.copy(os.path.join(root, "oracle_detections.npy"), det_path)
    feather = assemble(args, root, "oracle")

    # ---- 6. train (CLI) ----------------------------------------------------
    exp = os.path.join(args.out, "exp_dqn")
    os.makedirs(exp, exist_ok=True)
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump({
            "DATASET": feather, "PANORAMA": False,
            "ARCHITECTURE": "extra_capacity", "USE_INVERSE_ACTIONS": True,
            "LOSS_CLIP": "rect", "GAMMA": 0.99, "LEARNING_RATE": 0.0001,
            "NUM_STEPS": args.steps, "CHECKPOINT_INTERVAL": args.steps,
            "TARGET_UPDATE_INTERVAL": 8000, "SEED": 4,
            # the flagship infeed (round-4 verdict Weak #4): decode once,
            # upload once, scan-chunked fused steps — at lifecycle
            # resolutions the corpus always fits HBM, so the front-door
            # artifact exercises the framework's production path
            "TPU": {"BATCH_SIZE": args.batch, "IMAGE_SIZE": args.size,
                    "DEVICE_DATASET": not args.host_fed},
        }, f)
    if not os.path.exists(os.path.join(exp, "models",
                                       f"sample{args.steps}.ckpt")):
        dt, out = run_cli(["train_q_network.py", exp], cpu=args.cpu)
        emit("lifecycle_train_frames_per_sec",
             args.steps * args.batch / dt, "frames/sec",
             steps=args.steps, batch=args.batch)

    # ---- 7. eval (CLI): model-scored SPL on the furnished workload --------
    eval_cfg = os.path.join(args.out, "eval.yml")
    res_dir = os.path.join(args.out, "results")
    with open(eval_cfg, "w") as f:
        yaml.safe_dump({
            "SCORE": "model", "MODEL_CONFIG_LOCATION": exp,
            "MODEL_NUMBER": args.steps,
            "SLAM": True, "SEED": 1, "RESULT_LOCATION": res_dir,
        }, f)
    dt, out = run_cli(
        ["evaluation/run.py", "--workload", str(args.episodes),
         "--furnished-env", "--batched", "8", eval_cfg], cpu=args.cpu)
    emit("lifecycle_model_spl", _parse_mean_spl(out), "mean SPL",
         episodes=args.episodes, eval_seconds=round(dt, 1))

    # oracle twin on the identical generated workload (upper bound; the
    # geodesic scorer needs no device)
    oracle_cfg = os.path.join(args.out, "eval_oracle.yml")
    with open(oracle_cfg, "w") as f:
        yaml.safe_dump({
            "SCORE": "geodesic", "SLAM": True, "SEED": 1,
            "RESULT_LOCATION": os.path.join(args.out, "results_oracle"),
        }, f)
    dt, out = run_cli(
        ["evaluation/run.py", "--workload", str(args.episodes),
         "--furnished-env", oracle_cfg], cpu=True)
    emit("lifecycle_oracle_spl", _parse_mean_spl(out), "mean SPL",
         episodes=args.episodes)

    _flush_rows(args)


def _flush_rows(args):
    """Merge this invocation's rows with earlier (resumed) ones: stages
    whose artifacts already existed were skipped and emitted nothing."""
    rows_path = os.path.join(args.out, "lifecycle_rows.json")
    merged = {}
    if os.path.exists(rows_path):
        for row in json.load(open(rows_path)):
            merged[row["metric"]] = row
    for row in ROWS:
        merged[row["metric"]] = row
    with open(rows_path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)


if __name__ == "__main__":
    main()
