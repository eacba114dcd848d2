"""Episode-loop runner: walks the 1,075 fixed validation episodes, reuses
the env across episodes of the same house, logs per-episode results to
crash-safe shards.

Behavioral parity with /root/reference/evaluation/runner.py:28-96: seeds,
DiskLogger with 30-min shard rotation, env reuse per house, per-episode
floor sampling -> same-floor goal filtering -> agent placement ->
ours_evaluate -> logger.write(epind, output). Model loading supports both
this framework's sample<N>.ckpt and reference .torch checkpoints
(auto-converted via models/torch_convert).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from video_dqn_tpu.core import DiskLogger, latest_checkpoint_step
from video_dqn_tpu.eval.evaluate import make_geodesic_scorer, make_model_scorer, ours_evaluate
from video_dqn_tpu.eval.policy_config import name_from_config
from video_dqn_tpu.sim.gibson import CLASS_LABELS, get_house, relevant_locations


def load_eval_model(config, model_config):
    """Build the Q-net and load weights per config: PRETRAINED_MODEL_LOCATION
    (.torch reference checkpoint, auto-converted) or
    MODEL_CONFIG_LOCATION/models/sample<MODEL_NUMBER> (reference
    runner.py:52-61 + train_q_network.py:50-57)."""
    import jax

    from video_dqn_tpu.core.checkpoint import restore_checkpoint
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.models.torch_convert import convert_qnet, load_torch_state_dict

    model = build_qnet(model_config)
    params, batch_stats = init_qnet(model, jax.random.key(0))

    loc = config.PRETRAINED_MODEL_LOCATION
    if loc:
        sd = load_torch_state_dict(loc)
        params, batch_stats = convert_qnet(
            sd, model.extra_capacity, model.num_frames
        )
    else:
        models_dir = os.path.join(model_config.folder, "models")
        template = {"params": params, "batch_stats": batch_stats}
        # sample<N>.ckpt holds the full TrainState; restore leniently
        from flax import serialization

        path = os.path.join(models_dir, f"sample{config.MODEL_NUMBER}.ckpt")
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        state = raw["state"]
        params = serialization.from_state_dict(params, state["params"])
        if state.get("batch_stats"):
            batch_stats = serialization.from_state_dict(
                batch_stats, state["batch_stats"]
            )
    return model, params, batch_stats


def build_detector_from_config(config):
    """Construct the fusion detector from the eval config — the in-policy
    equivalent of the reference's detectron2 DefaultPredictor construction
    when COMBINE_DETECTOR or SCORE=='detector' is set
    (/root/reference/evaluation/evaluate.py:34-38,97-100; built once here
    and reused across episodes rather than per-episode — same predictor
    every time). Returns None when no detector mode is on; fails loudly
    when one is on but DETECTOR_WEIGHTS is unset."""
    if not (config.COMBINE_DETECTOR or config.SCORE == "detector"):
        return None
    weights = config.DETECTOR_WEIGHTS if "DETECTOR_WEIGHTS" in config else ""
    if not weights:
        raise ValueError(
            "COMBINE_DETECTOR/SCORE=='detector' needs DETECTOR_WEIGHTS in "
            "the eval config: a Mask R-CNN checkpoint path (convert the "
            "published detectron2 weights with scripts/convert_weights.py) "
            "or 'stub' for the deterministic test detector"
        )
    if weights == "stub":
        from video_dqn_tpu.data.detect import StubDetector

        return StubDetector()
    from video_dqn_tpu.models.detector.inference import load_detector

    return load_detector(weights)


def run_policy(
    config,
    episodes: Optional[np.ndarray] = None,
    env_factory: Optional[Callable] = None,
    house_factory: Optional[Callable] = None,
    scorer_factory: Optional[Callable] = None,
    detector=None,
    visualize_every: int = 100,
    debug: bool = False,
    episodes_path: str = "evaluation/val_episodes.npy",
    resume: bool = False,
    start: int = 0,
):
    """Run the episode loop.

    Injection points (all optional, defaulting to the reference wiring):
      episodes:        (N, 6) object array rows
                       (house, floor, class, goal_dist, pos, rot)
      env_factory:     (house, model_config, config) -> NavEnv
      house_factory:   name -> GibsonHouse-like (objects/object_locations)
      scorer_factory:  (env, class_index) -> view scorer; default builds
                       the jitted batched Q scorer from the loaded model
    """
    np.random.seed(config.SEED)

    if detector is None:
        detector = build_detector_from_config(config)

    log_folder = os.path.join(config.RESULT_LOCATION, name_from_config(config))
    logger = DiskLogger(log_folder, checkpoint_time=60 * 30)
    # resume: skip episodes whose results already exist in the shards
    # (the reference parsed a -r flag but never used it, runner.py:117-130;
    # here it works — shards merge crash-safely so reruns are incremental)
    done = set()
    if resume:
        from video_dqn_tpu.core import DiskReader

        done = set(DiskReader(log_folder).data().keys())

    if episodes is None:
        episodes = np.load(episodes_path, allow_pickle=True)

    model_config = config.MODEL_CONFIG
    model = params = batch_stats = None
    if config.SCORE == "model" and scorer_factory is None:
        from video_dqn_tpu.core.experiment import ExperimentConfig

        mc = ExperimentConfig(config.MODEL_CONFIG_LOCATION, resume=True,
                              tensorboard=False)
        model, params, batch_stats = load_eval_model(config, mc)
        model_config = mc

    house_factory = house_factory or get_house
    house_name, env, house = "", None, None

    for epind in range(start, len(episodes)):
        if epind in done:
            continue
        ep = episodes[epind]
        # per-episode progress line (reference runner.py:67 prints
        # EP_INDEX per episode under tqdm; long runs should not be silent)
        print(f"EP_INDEX: {epind}/{len(episodes)}", flush=True)
        hn, floor, class_label, goal_dist, pos, rot = ep
        if house_name != hn:
            if env is not None:
                env.close()
            house_name = hn
            house = house_factory(hn)
            if env_factory is not None:
                env = env_factory(house, model_config, config)
            else:
                from video_dqn_tpu.sim.fake_env import FakeNavEnv

                env = FakeNavEnv(
                    panorama=bool(
                        config.SCORE == "model" and model_config.PANORAMA
                    )
                )

        loc = env.sample_start_state(int(floor))[0]
        goals = relevant_locations(
            loc, house.object_locations_for_habitat_dest[class_label]
        )
        env.goals = goals
        env.set_agent_state(pos, rot)

        if scorer_factory is not None:
            scorer = scorer_factory(env, CLASS_LABELS.index(class_label))
        elif config.SCORE == "model":
            scorer = make_model_scorer(
                model, params, batch_stats, CLASS_LABELS.index(class_label),
                image_size=int(model_config.TPU.IMAGE_SIZE),
            )
        else:
            scorer = make_geodesic_scorer(env)

        vis = epind % visualize_every == 0
        out = ours_evaluate(
            config, env, ep, house, epind, scorer, vis, model_config,
            detector=detector,
        )
        if not debug:
            logger.write(epind, out)
    if env is not None:
        env.close()
    calls = getattr(detector, "calls", None)
    if calls is not None:
        # one fused call per reasoning stop — lets artifact scripts record
        # stops/episode without instrumenting the policy
        print(f"Detector calls: {calls}", flush=True)
    return logger
