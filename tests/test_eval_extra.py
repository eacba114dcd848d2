"""Extra eval coverage: model-scorer episodes (with fused off-resolution
resize), runner resume, torn result shards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_dqn_tpu.core import DiskLogger, DiskReader
from video_dqn_tpu.eval import make_model_scorer, ours_evaluate, run_policy
from video_dqn_tpu.eval.fixtures import FakeHouse, make_env_and_episode
from video_dqn_tpu.models.qnet import HabitatDQN
from video_dqn_tpu.plan.mapper import DepthMapperAndPlanner
from tests.test_eval import eval_cfg, small_planner


def test_model_scorer_resizes_views():
    """Views rendered at 64px go through the fused resize into a 96px
    model — the whole scorer is one jitted call."""
    model = HabitatDQN(action_dim=3, extra_capacity=False, panorama=False,
                       dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 96, 96, 3)), False)
    scorer = make_model_scorer(model, variables["params"],
                               variables.get("batch_stats", {}), 4,
                               image_size=96)
    views = np.random.default_rng(0).integers(0, 256, (12, 64, 64, 3), np.uint8)
    scores = scorer(views)
    assert scores.shape == (12,)
    assert np.isfinite(scores).all()


def test_episode_with_model_scorer():
    env, house, ep = make_env_and_episode(size=64)
    model = HabitatDQN(action_dim=3, extra_capacity=False, panorama=False,
                       dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 64, 64, 3)), False)
    scorer = make_model_scorer(model, variables["params"],
                               variables.get("batch_stats", {}),
                               class_index=4, image_size=64)
    cfg = eval_cfg(SLAM=True, SEED=1, SCORE="model")
    spl = ours_evaluate(cfg, env, ep, house, 0, scorer,
                        planner=small_planner(env))
    assert 0 <= spl <= 1  # random net may or may not find the goal


def test_runner_resume_skips_done(tmp_path):
    env, house, ep = make_env_and_episode()
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    episodes = np.array([ep, ep, ep], dtype=object)
    calls = {"n": 0}

    def env_factory(h, mc, c):
        e, _, _ = make_env_and_episode()
        return e

    def scorer_factory(e, ci):
        calls["n"] += 1
        from video_dqn_tpu.eval import make_geodesic_scorer

        return make_geodesic_scorer(e)

    run_policy(cfg, episodes=episodes[:2], env_factory=env_factory,
               house_factory=lambda n: house, scorer_factory=scorer_factory,
               visualize_every=1000)
    assert calls["n"] == 2
    # resume over all 3: only the missing episode runs
    run_policy(cfg, episodes=episodes, env_factory=env_factory,
               house_factory=lambda n: house, scorer_factory=scorer_factory,
               visualize_every=1000, resume=True)
    assert calls["n"] == 3
    from video_dqn_tpu.eval import display_results

    assert len(DiskReader(str(tmp_path / "r") + "/geodesic_spl_slam_seed1").data()) == 3


def test_disk_reader_skips_torn_shard(tmp_path):
    folder = str(tmp_path / "res")
    log = DiskLogger(folder)
    log.write(0, 0.5)
    # a crash mid-write leaves a torn file: must be skipped, not fatal
    with open(f"{folder}/deadbeef_123.npy", "wb") as f:
        f.write(b"\x93NUMPY garbage")
    data = DiskReader(folder).data()
    assert data == {0: 0.5}
