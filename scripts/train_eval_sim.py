#!/usr/bin/env python
"""Self-contained product loop on generated scenes: walk the furnished
procedural house -> assemble the standard quadruplet feather (proximity
rewards, true actions) -> train the value network on the TPU -> evaluate
model-scored navigation SPL against random and oracle baselines in the
same house.

No external data: the reference needs YouTube videos + pretrained
detectors + licensed Gibson scenes to close this loop; this script proves
every stage of the framework end-to-end with none of them.

Usage: python scripts/train_eval_sim.py [--steps 1500] [--episodes 20]
       [--out /tmp/sim_loop] [--size 96]
Prints one JSON line per result row.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sim_loop")
    ap.add_argument("--size", type=int, default=96,
                    help="frame resolution for the whole loop "
                         "(224 = the flagship config's resolution)")
    ap.add_argument("--videos", type=int, default=30)
    ap.add_argument("--video-steps", type=int, default=300)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--reward-dist", type=float, default=1.5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import yaml

    from video_dqn_tpu.core import ExperimentConfig, latest_checkpoint_step
    from video_dqn_tpu.data.qlearning import QLearningBatcher
    from video_dqn_tpu.data.sim_dataset import generate_sim_dataset
    from video_dqn_tpu.eval import (
        display_results,
        make_geodesic_scorer,
        make_model_scorer,
        run_policy,
    )
    from video_dqn_tpu.eval.policy_config import get_eval_defaults
    from video_dqn_tpu.eval.fixtures import make_furnished_house
    from video_dqn_tpu.sim.gibson import CLASS_LABELS, relevant_locations
    from video_dqn_tpu.train import run_train

    os.makedirs(args.out, exist_ok=True)

    # ---- 1. generate ------------------------------------------------------
    env, house = make_furnished_house(size_px=args.size, seed=0)
    ds_root = os.path.join(args.out, "dataset")
    feather = os.path.join(ds_root, "data.feather")
    t0 = time.time()
    if not os.path.exists(feather):
        feather = generate_sim_dataset(
            env, house, ds_root, n_videos=args.videos,
            steps_per_video=args.video_steps, reward_dist=args.reward_dist,
            seed=0, floor=None,  # alternate floors: every class covered
        )
    print(f"dataset: {feather} ({time.time() - t0:.0f}s)")

    # ---- 2. train ----------------------------------------------------------
    exp = os.path.join(args.out, "exp")
    os.makedirs(exp, exist_ok=True)
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump(
            {
                "DATASET": feather,
                "PANORAMA": False,
                "ARCHITECTURE": "extra_capacity",
                "USE_INVERSE_ACTIONS": False,
                "ONE_ACTION": True,
                "VALUE_LEARNING": True,
                "TRAIN_ON_GROUND_TRUTH": True,
                "GAMMA": 0.9,
                "LEARNING_RATE": 0.0001,
                "NUM_STEPS": args.steps,
                "CHECKPOINT_INTERVAL": args.steps,
                "TARGET_UPDATE_INTERVAL": 8000,
                "SEED": 4,
                "TPU": {"BATCH_SIZE": args.batch, "IMAGE_SIZE": args.size},
            },
            f,
        )
    config = ExperimentConfig(exp, tensorboard=False)
    batcher = QLearningBatcher(
        feather, one_action=True, value_learning=True, image_size=args.size,
        seed=4, cache_images=True,
    )
    print(f"rows: {len(batcher)}, reward ratio: {batcher.reward_percentage():.3f}")
    t0 = time.time()
    _, loss = run_train(config, batcher=batcher)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s, "
          f"final EMA loss {loss}")

    # ---- 3. evaluate: model vs random vs oracle ---------------------------
    from video_dqn_tpu.eval.runner import load_eval_model

    ecfg_model = get_eval_defaults()
    ecfg_model.SCORE = "model"
    ecfg_model.MODEL_CONFIG_LOCATION = exp
    ecfg_model.MODEL_NUMBER = latest_checkpoint_step(
        os.path.join(exp, "models"))
    mc = ExperimentConfig(exp, resume=True, tensorboard=False)
    model, params, batch_stats = load_eval_model(ecfg_model, mc)

    # fixed episode set on both floors
    ep_env, _ = make_furnished_house(size_px=args.size, seed=7)
    rng = np.random.default_rng(7)
    episodes = []
    for i in range(args.episodes):
        # (floor, cls) resampled INSIDE the retry loop: every class lives
        # on exactly one floor of the furnished house, so a fixed
        # mismatched pair would never find a same-floor goal
        for _ in range(1000):
            floor = int(rng.integers(0, 2))
            cls = CLASS_LABELS[int(rng.integers(0, len(CLASS_LABELS)))]
            start, ang = ep_env.sample_start_state(floor)
            goals = relevant_locations(
                start, house.object_locations_for_habitat_dest[cls])
            if not goals:
                continue
            gd = min(ep_env.geodesic_distance(start, g) for g in goals)
            if np.isfinite(gd) and gd > 1.5:
                break
        else:
            raise RuntimeError("could not sample a reachable episode")
        episodes.append(("FurnishedHouse", floor, cls, gd, start, ang))
    episodes = np.array(episodes, dtype=object)

    def run_with(name, scorer_factory):
        cfg = get_eval_defaults()
        cfg.SCORE = "geodesic"  # naming only; scorer_factory decides
        cfg.SEED = 1
        cfg.SLAM = True
        cfg.RESULT_LOCATION = os.path.join(args.out, f"results_{name}")
        run_policy(
            cfg,
            episodes=episodes,
            env_factory=lambda h, mcfg, c: ep_env.clone(seed=3),
            house_factory=lambda n: house,
            scorer_factory=scorer_factory,
        )
        return float(display_results(cfg, quiet=True))

    walk_rng = np.random.default_rng(0)
    results = {}
    results["random"] = run_with(
        "random",
        lambda e, ci: (lambda ims: walk_rng.uniform(size=len(ims))),
    )
    results["model"] = run_with(
        "model",
        lambda e, ci: make_model_scorer(model, params, batch_stats, ci,
                                        image_size=args.size),
    )
    results["oracle"] = run_with(
        "oracle", lambda e, ci: make_geodesic_scorer(e))

    for name in ("random", "model", "oracle"):
        print(json.dumps({
            "metric": f"sim_loop_spl_{name}",
            "value": round(results[name], 4),
            "unit": "mean SPL",
            "episodes": int(args.episodes),
        }))


if __name__ == "__main__":
    main()
