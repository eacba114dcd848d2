#!/usr/bin/env python
"""Self-contained product loop on generated scenes: walk the furnished
procedural house -> assemble the standard quadruplet feather (proximity
rewards) -> train the value network on the TPU -> evaluate model-scored
navigation SPL against random and oracle baselines in the same house.

Two modes:

  default          round-2 loop: value regression (ONE_ACTION +
                   VALUE_LEARNING) on ground-truth gamma^steps targets.
  --pseudo-labels  the PAPER'S loop (zero action labels): train the
                   inverse-action model on generated single-step pairs,
                   pseudo-label the quadruplets' actions with it, train
                   the published 3-action double-DQN config on those
                   pseudo-labels — and a truth-action twin for the SPL
                   delta. Mirrors /root/reference/dataset/
                   process_episodes_real.py:164-179 (labeling),
                   train_inverse_model.py:179-199 (inverse training), and
                   configs/experiments/real_data/config.yml
                   (USE_INVERSE_ACTIONS double-DQN training).

No external data: the reference needs YouTube videos + pretrained
detectors + licensed Gibson scenes to close either loop; this script
proves every stage of the framework end-to-end with none of them.

Usage: python scripts/train_eval_sim.py [--steps 1500] [--episodes 20]
       [--out /tmp/sim_loop] [--size 96] [--pseudo-labels]
Prints one JSON line per result row.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_exp(exp: str, feather: str, args, mode: str):
    import yaml

    os.makedirs(exp, exist_ok=True)
    base = {
        "DATASET": feather,
        "PANORAMA": False,
        "ARCHITECTURE": "extra_capacity",
        "LEARNING_RATE": 0.0001,
        "NUM_STEPS": args.steps,
        "CHECKPOINT_INTERVAL": args.steps,
        "TARGET_UPDATE_INTERVAL": 8000,
        "SEED": 4,
        "TPU": {"BATCH_SIZE": args.batch, "IMAGE_SIZE": args.size},
    }
    if mode == "value":
        base.update({
            "USE_INVERSE_ACTIONS": False, "ONE_ACTION": True,
            "VALUE_LEARNING": True, "TRAIN_ON_GROUND_TRUTH": True,
            "GAMMA": 0.9,
        })
    else:  # 'dqn': the published real_data recipe (3-action double DQN)
        base.update({
            "USE_INVERSE_ACTIONS": True, "ONE_ACTION": False,
            "VALUE_LEARNING": False, "LOSS_CLIP": "rect", "GAMMA": 0.99,
        })
    with open(os.path.join(exp, "config.yml"), "w") as f:
        yaml.safe_dump(base, f)


def train_q(exp: str, feather: str, args, mode: str):
    import time as _t

    from video_dqn_tpu.core import ExperimentConfig
    from video_dqn_tpu.data.qlearning import QLearningBatcher

    from video_dqn_tpu.train import run_train

    write_exp(exp, feather, args, mode)
    config = ExperimentConfig(exp, tensorboard=False)
    batcher = QLearningBatcher(
        feather,
        one_action=(mode == "value"),
        value_learning=(mode == "value"),
        inverse_actions=(mode == "dqn"),
        gamma=0.99 if mode == "dqn" else 0.9,
        image_size=args.size, seed=4, cache_images=True,
    )
    print(f"[{os.path.basename(exp)}] rows: {len(batcher)}, "
          f"reward ratio: {batcher.reward_percentage():.3f}")
    t0 = _t.time()
    _, loss = run_train(config, batcher=batcher)
    print(f"[{os.path.basename(exp)}] trained {args.steps} steps in "
          f"{_t.time() - t0:.0f}s, final EMA loss {loss}")
    return exp


def make_episodes(house, args, size: int):
    """Fixed episode set on both floors of a fresh clone of the house."""
    import numpy as np

    from video_dqn_tpu.eval.fixtures import make_furnished_house
    from video_dqn_tpu.sim.gibson import CLASS_LABELS, relevant_locations

    ep_env, _ = make_furnished_house(size_px=size, seed=7)
    rng = np.random.default_rng(7)
    episodes = []
    for _ in range(args.episodes):
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
    return np.array(episodes, dtype=object), ep_env


def eval_scorers(scorers, episodes, ep_env, house, args):
    """Run each named scorer factory over the fixed episodes; return
    {name: mean_spl}."""
    from video_dqn_tpu.eval import display_results, run_policy
    from video_dqn_tpu.eval.policy_config import get_eval_defaults

    results = {}
    for name, factory in scorers.items():
        cfg = get_eval_defaults()
        cfg.SCORE = "geodesic"  # naming only; scorer factory decides
        cfg.SEED = 1
        cfg.SLAM = True
        cfg.RESULT_LOCATION = os.path.join(args.out, f"results_{name}")
        run_policy(
            cfg,
            episodes=episodes,
            env_factory=lambda h, mcfg, c: ep_env.clone(seed=3),
            house_factory=lambda n: house,
            scorer_factory=factory,
        )
        results[name] = float(display_results(cfg, quiet=True))
    return results


def model_scorer_factory(exp: str, args):
    from video_dqn_tpu.core import ExperimentConfig, latest_checkpoint_step
    from video_dqn_tpu.eval import make_model_scorer
    from video_dqn_tpu.eval.policy_config import get_eval_defaults
    from video_dqn_tpu.eval.runner import load_eval_model

    ecfg = get_eval_defaults()
    ecfg.SCORE = "model"
    ecfg.MODEL_CONFIG_LOCATION = exp
    ecfg.MODEL_NUMBER = latest_checkpoint_step(os.path.join(exp, "models"))
    mc = ExperimentConfig(exp, resume=True, tensorboard=False)
    model, params, batch_stats = load_eval_model(ecfg, mc)
    return lambda e, ci: make_model_scorer(model, params, batch_stats, ci,
                                           image_size=args.size)


def pseudo_label_feather(feather: str, labeler, image_size: int,
                         batch: int = 256) -> str:
    """Replace inverse_actions with the inverse model's predictions over
    (before, after) image pairs (reference process_episodes_real.py:164-179
    — batches of 8 there, larger here); the true actions move to a
    true_actions column for diagnostics. Returns
    (new feather path, agreement with truth)."""
    import numpy as np

    from video_dqn_tpu.data.qlearning import load_images
    from video_dqn_tpu.data.schema import read_feather, write_feather

    df = read_feather(feather)
    if getattr(labeler, "supports_table", False):
        # decode-once table path (TableInverseLabeler): each unique frame
        # decoded + uploaded exactly once, gathers on device
        preds = labeler.label_rows(df["before_image"].tolist(),
                                   df["after_image"].tolist(), image_size)
    else:
        preds = []
        for i in range(0, len(df), batch):
            rows = df.iloc[i : i + batch]
            before = load_images(rows["before_image"], image_size)
            after = load_images(rows["after_image"], image_size)
            preds.append(np.asarray(labeler(before, after)))
        preds = np.concatenate(preds).astype(np.int64)
    df["true_actions"] = df["inverse_actions"]
    df["inverse_actions"] = preds
    out = os.path.join(os.path.dirname(feather), "data_pseudo.feather")
    write_feather(df, out)
    acc = float((preds == df["true_actions"].to_numpy()).mean())
    return out, acc


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
    ap.add_argument("--pseudo-labels", action="store_true",
                    help="close the zero-action-label loop: inverse model "
                         "-> pseudo-labels -> published DQN config")
    ap.add_argument("--inverse-walks", type=int, default=8)
    ap.add_argument("--inverse-walk-steps", type=int, default=250)
    ap.add_argument("--inverse-steps", type=int, default=1500)
    ap.add_argument("--inverse-batch", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from video_dqn_tpu.data.sim_dataset import generate_sim_dataset
    from video_dqn_tpu.eval import make_geodesic_scorer
    from video_dqn_tpu.eval.fixtures import make_furnished_house

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

    rows = []  # (metric_name, value, extra)

    if args.pseudo_labels:
        # ---- 2a. inverse model on generated single-step pairs ------------
        from video_dqn_tpu.data.episodes import make_inverse_labeler
        from video_dqn_tpu.data.gibson_pairs import GibsonPairBatcher
        from video_dqn_tpu.data.sim_dataset import generate_inverse_pairs
        from video_dqn_tpu.train.inverse import (
            make_inverse_eval,
            run_inverse_train,
        )

        pairs_root = os.path.join(args.out, "inverse_pairs")
        train_npy = os.path.join(pairs_root, "inverse_train_data.npy")
        if not os.path.exists(train_npy):
            walk_env, _ = make_furnished_house(size_px=args.size, seed=11)
            generate_inverse_pairs(
                walk_env, pairs_root, n_walks=args.inverse_walks,
                steps_per_walk=args.inverse_walk_steps, seed=11,
            )
        image_root = os.path.join(pairs_root, "states")
        train_b = GibsonPairBatcher(train_npy, image_root=image_root,
                                    image_size=args.size, seed=0,
                                    cache_images=True)
        val_b = GibsonPairBatcher(
            os.path.join(pairs_root, "inverse_val_data.npy"),
            image_root=image_root, image_size=args.size, seed=0,
            cache_images=True)
        print(f"inverse pairs: {len(train_b)} train / {len(val_b)} val")
        t0 = time.time()
        inv_model, inv_state = run_inverse_train(
            train_b, val_b, out_dir=os.path.join(args.out, "inverse_model"),
            batch_size=args.inverse_batch, num_steps=args.inverse_steps,
            image_size=args.size, seed=0,
        )
        # final held-out accuracy
        eval_fn = make_inverse_eval(inv_model)
        accs = []
        for _ in range(10):
            vb = val_b.get_batch(batch_size=min(args.inverse_batch, len(val_b)))
            accs.append(float(eval_fn(inv_state.params,
                                      inv_state.batch_stats, vb)[1]))
        inv_acc = float(np.mean(accs))
        print(f"inverse model: val accuracy {inv_acc:.3f} "
              f"({time.time() - t0:.0f}s)")
        rows.append(("sim_loop_inverse_val_accuracy", inv_acc, {}))

        # ---- 2b. pseudo-label the quadruplets ----------------------------
        labeler = make_inverse_labeler(inv_model, inv_state.params,
                                       inv_state.batch_stats)
        pseudo_feather, label_acc = pseudo_label_feather(
            feather, labeler, args.size)
        print(f"pseudo labels: agreement with truth {label_acc:.3f} "
              f"(stride-3 pairs labeled by a single-step model — the "
              f"reference's own approximation)")
        rows.append(("sim_loop_pseudo_label_agreement", label_acc, {}))

        # ---- 3. train the published DQN config: truth vs pseudo ----------
        exp_true = train_q(os.path.join(args.out, "exp_dqn_true"),
                           feather, args, mode="dqn")
        exp_pseudo = train_q(os.path.join(args.out, "exp_dqn_pseudo"),
                             pseudo_feather, args, mode="dqn")

        episodes, ep_env = make_episodes(house, args, args.size)
        walk_rng = np.random.default_rng(0)
        results = eval_scorers(
            {
                "random": lambda e, ci: (
                    lambda ims: walk_rng.uniform(size=len(ims))),
                "dqn_true_actions": model_scorer_factory(exp_true, args),
                "dqn_pseudo_actions": model_scorer_factory(exp_pseudo, args),
                "oracle": lambda e, ci: make_geodesic_scorer(e),
            },
            episodes, ep_env, house, args,
        )
        for name, val in results.items():
            rows.append((f"sim_loop_spl_{name}", val,
                         {"episodes": int(args.episodes)}))
    else:
        # ---- 2. value-learning loop (round-2 default) --------------------
        exp = train_q(os.path.join(args.out, "exp"), feather, args,
                      mode="value")
        episodes, ep_env = make_episodes(house, args, args.size)
        walk_rng = np.random.default_rng(0)
        results = eval_scorers(
            {
                "random": lambda e, ci: (
                    lambda ims: walk_rng.uniform(size=len(ims))),
                "model": model_scorer_factory(exp, args),
                "oracle": lambda e, ci: make_geodesic_scorer(e),
            },
            episodes, ep_env, house, args,
        )
        for name, val in results.items():
            rows.append((f"sim_loop_spl_{name}", val,
                         {"episodes": int(args.episodes)}))

    for name, val, extra in rows:
        print(json.dumps({
            "metric": name,
            "value": round(val, 4),
            "unit": "mean SPL" if "spl" in name else "accuracy",
            **extra,
        }))


if __name__ == "__main__":
    main()
