"""The full product loop: train a Q-net -> sample<N> checkpoint ->
run_policy(SCORE='model') loads it through MODEL_CONFIG_LOCATION ->
episodes produce SPL results. One test, every seam."""

import numpy as np
import pytest
import yaml

import jax

from video_dqn_tpu.core import ExperimentConfig
from video_dqn_tpu.data.qlearning import QLearningBatcher
from video_dqn_tpu.data.synthetic import make_synthetic_dataset
from video_dqn_tpu.eval import display_results, run_policy
from video_dqn_tpu.eval.fixtures import make_env_and_episode
from video_dqn_tpu.eval.policy_config import get_eval_defaults
from video_dqn_tpu.train import run_train


def test_train_checkpoint_eval_loop(tmp_path, mesh8):
    # --- train (basic arch: params are input-size agnostic) --------------
    feather = make_synthetic_dataset(str(tmp_path / "ds"), num_videos=2,
                                     frames_per_video=12, image_size=64)
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yml").write_text(
        yaml.safe_dump(
            {
                "DATASET": feather,
                "PANORAMA": False,
                "ARCHITECTURE": "basic",
                "USE_INVERSE_ACTIONS": True,
                "NUM_STEPS": 2,
                "CHECKPOINT_INTERVAL": 2,
                "TPU": {"BATCH_SIZE": 4, "COMPUTE_DTYPE": "float32"},
            }
        )
    )
    config = ExperimentConfig(str(exp), tensorboard=False)
    batcher = QLearningBatcher(feather, one_action=True, inverse_actions=True,
                               image_size=64)
    run_train(config, batcher=batcher, mesh=mesh8, log_every=100)

    # --- eval with the trained checkpoint ---------------------------------
    env, house, ep = make_env_and_episode(goal_cells=(3, 3),
                                          start_cells=(2, 2), size=64)
    ecfg = get_eval_defaults()
    ecfg.SCORE = "model"
    ecfg.SLAM = True
    ecfg.SEED = 1
    ecfg.MODEL_NUMBER = 2
    ecfg.MODEL_CONFIG_LOCATION = str(exp)
    ecfg.RESULT_LOCATION = str(tmp_path / "results")

    episodes = np.array([ep], dtype=object)
    run_policy(
        ecfg,
        episodes=episodes,
        env_factory=lambda h, mc, c: make_env_and_episode(size=64)[0],
        house_factory=lambda name: house,
        visualize_every=1000,
    )
    mean = display_results(ecfg, quiet=True)
    assert mean is not None and 0 <= mean <= 1
